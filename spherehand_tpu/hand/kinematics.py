"""Forward kinematics: 26 pose parameters -> 17 bone transforms, fully batched.

Re-design of the reference's module tree (``mesh/kinematicsTransformation.py``:
``Palm`` :157-177, ``Finger``/``FingerJoint`` :83-127) as one pure function.
Where the reference builds each 4x4 by in-place indexing per joint (17 small
sequential matmul chains, latency-bound on GPU), this version materializes all
finger-joint rotations as a single ``(B, 5, 3, 3)`` Rodrigues batch and chains
the three phalanges with three batched ``(B, 5, 4, 4)`` matmuls, which XLA maps
onto the MXU as a few fused contractions.

Parameter layout (reference kinematicsTransformation.py:169-175):
  params[0:3]  palm rotation angles (applied as Rz @ Ry @ Rx)
  params[3:6]  palm translation (mm)
  params[6+4f : 10+4f]  finger f: [abduct, flex1, flex2, flex3]

Bone/transform order matches the asset bone order: [metacarpals, carpals,
(finger j1, j2, j3) x 5]. The carpals transform equals the palm transform
(reference kinematicsTransformation.py:153-155). Per-finger abduction axes are
[z, z, -y, -y, z] (reference :162-164); all flexion is about +x.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from spherehand_tpu.hand.assets import HandModel

# All kinematic-chain matmuls run at full f32 precision: TPU matmuls default
# to bfloat16 passes, whose ~0.4% relative error is ~0.4 mm on mm-scale
# translations — far above the 0.5 mm accuracy budget. These contractions are
# tiny (4x4), so the precision costs nothing.
_HIGHEST = jax.lax.Precision.HIGHEST


def _mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(a, b, precision=_HIGHEST)


# Abduction axis for each of the 5 finger chains, in asset order
# (finger4, finger3, finger2, finger1, finger5/thumb).
ABDUCT_AXES = np.asarray(
    [[0.0, 0.0, 1.0], [0.0, 0.0, 1.0], [0.0, -1.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, 1.0]],
    np.float32,
)


def rotation_about_axis(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues rotation matrices about fixed unit axes.

    axis: (..., 3) unit vectors; angle: (...,) radians. Returns (..., 3, 3).
    R = cos(t) I + sin(t) [a]_x + (1 - cos(t)) a a^T.
    """
    axis = jnp.broadcast_to(axis, angle.shape + (3,))
    c = jnp.cos(angle)[..., None, None]
    s = jnp.sin(angle)[..., None, None]
    eye = jnp.eye(3, dtype=axis.dtype)
    outer = axis[..., :, None] * axis[..., None, :]
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    cross = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    return c * eye + s * cross + (1.0 - c) * outer


def _embed44(rot: jnp.ndarray) -> jnp.ndarray:
    """Embed (..., 3, 3) rotations into (..., 4, 4) homogeneous transforms."""
    batch = rot.shape[:-2]
    out = jnp.zeros(batch + (4, 4), rot.dtype)
    out = out.at[..., :3, :3].set(rot)
    return out.at[..., 3, 3].set(1.0)


def palm_transform(palm_params: jnp.ndarray) -> jnp.ndarray:
    """6-DoF palm transform: translation @ Rz @ Ry @ Rx.

    palm_params: (B, 6) = [rx, ry, rz, tx, ty, tz]. Matches the reference's
    Palm.forward (kinematicsTransformation.py:145-155).
    """
    dtype = palm_params.dtype
    axes = jnp.eye(3, dtype=dtype)
    rx = rotation_about_axis(axes[0], palm_params[:, 0])
    ry = rotation_about_axis(axes[1], palm_params[:, 1])
    rz = rotation_about_axis(axes[2], palm_params[:, 2])
    rot = _mm(_mm(rz, ry), rx)
    g = _embed44(rot)
    return g.at[:, :3, 3].set(palm_params[:, 3:6])


def forward_kinematics(model: HandModel, params: jnp.ndarray) -> jnp.ndarray:
    """Pose parameters (B, 26) -> global bone transforms (B, 17, 4, 4).

    Each finger joint applies its local rotation conjugated by the bone offset:
    ``G_k = G_{k-1} @ inv(O_k) @ R_k @ O_k`` (reference FingerJoint.forward,
    kinematicsTransformation.py:92-112); joint 1 composes abduction then
    flexion about +x.
    """
    dtype = params.dtype
    batch = params.shape[0]
    palm = palm_transform(params[:, :6])  # (B, 4, 4)

    finger_params = params[:, 6:].reshape(batch, 5, 4)
    abduct_axes = jnp.asarray(ABDUCT_AXES, dtype)  # (5, 3)
    x_axis = jnp.asarray([1.0, 0.0, 0.0], dtype)

    r_abduct = rotation_about_axis(abduct_axes[None], finger_params[..., 0])  # (B,5,3,3)
    r_flex = rotation_about_axis(x_axis, finger_params[..., 1:])  # (B,5,3,3,3)
    local_rot = jnp.stack(
        [_mm(r_abduct, r_flex[:, :, 0]), r_flex[:, :, 1], r_flex[:, :, 2]],
        axis=2,
    )  # (B, 5, 3, 3, 3): [j1 = abduct@flex1, j2 = flex2, j3 = flex3]
    local = _embed44(local_rot)  # (B, 5, 3, 4, 4)

    # Offset conjugation. Finger f, joint k uses bone index 2 + 3f + k.
    offs = model.offset_mats[2:].reshape(5, 3, 4, 4).astype(dtype)
    inv_offs = model.inv_offset_mats[2:].reshape(5, 3, 4, 4).astype(dtype)
    local = _mm(_mm(inv_offs[None], local), offs[None])  # (B, 5, 3, 4, 4)

    g1 = _mm(palm[:, None], local[:, :, 0])  # (B, 5, 4, 4)
    g2 = _mm(g1, local[:, :, 1])
    g3 = _mm(g2, local[:, :, 2])
    fingers = jnp.stack([g1, g2, g3], axis=2).reshape(batch, 15, 4, 4)

    return jnp.concatenate([palm[:, None], palm[:, None], fingers], axis=1)
