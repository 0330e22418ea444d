"""Linear blend skinning and orthographic camera math (pure JAX).

Replaces the reference's buffer-holding modules (``mesh/pointTransformation.py``:
``LinearBlendSkinning`` :11-46, ``OthographicalProjection`` :69-99,
``InverseOthographicalProjection`` :102-124, ``RandScale`` :128-148) with pure
functions over a :class:`~spherehand_tpu.hand.assets.HandModel`.

Full-mesh LBS is one MXU matmul against the precomputed fused
``skin_matrix`` (see assets.py) instead of a per-bone matmul + bone-axis
reduce; keypoint LBS exploits single-bone ownership with a gather.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from spherehand_tpu.hand.assets import HandModel

# Skinning runs at full f32 matmul precision: TPU's default bf16 passes cost
# ~0.4 mm on mm-scale coordinates, and these contractions are a rounding error
# next to the CNN's FLOPs.
_HIGHEST = jax.lax.Precision.HIGHEST


def lbs_mesh(model: HandModel, transforms: jnp.ndarray) -> jnp.ndarray:
    """Skin the full mesh. transforms (B, 17, 4, 4) -> vertices (B, V, 4).

    skinned[b, v, m] = sum_j W[j, v] * (T[b, j] @ rest[v])[m], computed as one
    (B*4, 68) @ (68, V) matmul. The x coordinate is negated for the right hand
    (reference mesh/pointTransformation.py:44-45).
    """
    batch = transforms.shape[0]
    t_flat = transforms.transpose(0, 2, 1, 3).reshape(batch * 4, -1)  # (B*4, 68)
    skinned = jnp.matmul(t_flat, model.skin_matrix, precision=_HIGHEST).reshape(
        batch, 4, -1
    )  # (B, 4, V)
    skinned = skinned.transpose(0, 2, 1)  # (B, V, 4)
    if model.right_hand:
        skinned = skinned.at[..., 0].multiply(-1.0)
    return skinned


def lbs_faces(model: HandModel, transforms: jnp.ndarray) -> jnp.ndarray:
    """Skin the mesh directly in FACE-VERTEX order: (B, 17, 4, 4) -> (B, 3F, 4).

    Identical math to ``lbs_mesh(model, t)[:, faces.flat]`` (each output
    column's 68-term dot product is the same sequence of adds), but the
    per-vertex gather is baked into the precomputed ``skin_matrix_faces``
    columns, so face assembly downstream is a free reshape — the gather +
    layout copies cost ~1.5 ms/call at B=1024 on the render path.
    """
    batch = transforms.shape[0]
    t_flat = transforms.transpose(0, 2, 1, 3).reshape(batch * 4, -1)
    skinned = jnp.matmul(
        t_flat, model.skin_matrix_faces, precision=_HIGHEST
    ).reshape(batch, 4, -1)
    skinned = skinned.transpose(0, 2, 1)  # (B, 3F, 4)
    if model.right_hand:
        skinned = skinned.at[..., 0].multiply(-1.0)
    return skinned


def project_faces_planes(
    model: HandModel,
    transforms: jnp.ndarray,
    size: float,
    rand_f: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused LBS + orthographic projection in face-vertex order.

    Returns (u, v, z), each (B, 3F). The orthographic projection
    (u = x*f + c with w == 1; reference mesh/pointTransformation.py:69-99)
    is affine in homogeneous coordinates, so it folds into the per-batch
    bone-transform rows BEFORE the big skinning matmul: a tiny
    (B, 3, 68) = P @ T contraction followed by ONE
    (B, 3, 68) @ (68, 3F) matmul emits the projected planes directly —
    no (B, 3F, 4) intermediate, no transpose, no homogeneous column, 25%
    less matmul than skinning all four rows. The right-hand x negation
    (pointTransformation.py:44-45) folds into the u row's sign.

    Not bit-identical to lbs_faces + orthographic_project (the f*x scaling
    associates differently, ~1e-5 relative), so CUDA-parity comparisons
    should keep the unfused path; this is the production fast front end.
    """
    batch = transforms.shape[0]
    t = transforms.transpose(0, 2, 1, 3).reshape(batch, 4, -1)  # (B, 4, 68)
    fx = size / 300.0
    c = size / 2.0
    f = rand_f[:, None] * fx if rand_f is not None else jnp.full(
        (batch, 1), fx, transforms.dtype
    )
    sx = -f if model.right_hand else f
    # One (B, 68) @ (68, 3F) matmul per output row: slicing rows out of a
    # single (B, 3, 3F) product costs a ~0.3 ms/call layout copy at B=1024
    # (XLA picks a B-minor layout for the batched matmul output), while
    # three row matmuls emit u/v/z directly with no slice at the same MXU
    # cost (K=68 either way).
    mm = lambda row: jnp.matmul(
        row, model.skin_matrix_faces, precision=_HIGHEST
    )  # (B, 3F)
    return (
        mm(sx * t[:, 0] + c * t[:, 3]),
        mm(f * t[:, 1] + c * t[:, 3]),
        mm(t[:, 2]),
    )


def lbs_keypoints(model: HandModel, transforms: jnp.ndarray) -> jnp.ndarray:
    """Skin the 41 sphere centers. transforms (B, 17, 4, 4) -> (B, 41, 4).

    Each keypoint is owned by exactly one bone (weight 1.0), so this is a
    bone gather + small batched matmul.
    """
    per_kp = transforms[:, model.kp_bone]  # (B, 41, 4, 4)
    skinned = jnp.einsum(
        "bkmn,kn->bkm",
        per_kp,
        model.kp_local.astype(transforms.dtype),
        precision=_HIGHEST,
    )
    if model.right_hand:
        skinned = skinned.at[..., 0].multiply(-1.0)
    return skinned


def apply_random_scale(
    key: jax.Array, transforms: jnp.ndarray, scale_range: float
) -> jnp.ndarray:
    """Premultiply a random per-batch anisotropic scale onto all bone transforms.

    Per-axis scale ~ U[0.9 - s/2, 0.9 + s/2] (note: centered at 0.9, not 1.0),
    matching the reference RandScale (mesh/pointTransformation.py:140-148).
    """
    batch = transforms.shape[0]
    scales = (
        jax.random.uniform(key, (batch, 3), transforms.dtype) * scale_range
        + 0.9
        - scale_range / 2.0
    )
    scales = jnp.concatenate([scales, jnp.ones((batch, 1), transforms.dtype)], axis=-1)
    # diag(s) @ T just scales the rows of T.
    return transforms * scales[:, None, :, None]


def orthographic_project(
    points: jnp.ndarray, size: float, rand_f: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Orthographic camera: u = x * fx + cx with fx = size/300, cx = size/2.

    points: (B, N, 4) homogeneous. With ``rand_f`` (B,), the focal length is
    jittered per batch element and the output w is forced to 1
    (reference mesh/pointTransformation.py:84-99). z passes through unchanged.
    """
    fx = size / 300.0
    c = size / 2.0
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    if rand_f is not None:
        f = rand_f[:, None] * fx
        u = x * f + c
        v = y * f + c
    else:
        u = x * fx + c
        v = y * fx + c
    return jnp.stack([u, v, z, jnp.ones_like(z)], axis=-1)


def orthographic_project_xyz(
    points: jnp.ndarray, size: float, rand_f: jnp.ndarray | None = None
) -> jnp.ndarray:
    """:func:`orthographic_project` without the homogeneous-one column:
    (B, N, 4) -> (B, N, 3) [u, v, z]. Same u/v/z formulas bit for bit; the
    render path never reads w, so skipping it saves a (B, N) column write."""
    fx = size / 300.0
    c = size / 2.0
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    if rand_f is not None:
        f = rand_f[:, None] * fx
        u = x * f + c
        v = y * f + c
    else:
        u = x * fx + c
        v = y * fx + c
    return jnp.stack([u, v, z], axis=-1)


def inverse_orthographic(uvd: jnp.ndarray, size: float) -> jnp.ndarray:
    """Inverse of :func:`orthographic_project` at nominal focal length.

    uvd: (B, N, 4) -> xyz (B, N, 4) with x = (u - c) / fx
    (reference mesh/pointTransformation.py:102-124).
    """
    fx = size / 300.0
    c = size / 2.0
    x = (uvd[..., 0] - c) / fx
    y = (uvd[..., 1] - c) / fx
    return jnp.stack([x, y, uvd[..., 2], jnp.ones_like(x)], axis=-1)
