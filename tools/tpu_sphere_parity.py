"""Capture on-TPU compiled sphere-kernel parity: Mosaic vs the XLA oracle.

CPU tests exercise the fused sphere kernels (render/sphere_pallas.py) in
interpret mode only; Mosaic layout rules have diverged from interpret
semantics before (CLAUDE.md). This captures the real-chip artifact
``tests/goldens/tpu_sphere_parity.npz`` asserted by
tests/test_sphere_pallas.py::test_tpu_compiled_sphere_artifact:

A. Compiled-kernel vs compiled-XLA-oracle equivalence ON THE CHIP, at the
   production geometry (N=225 = 25 batch x 3x3 view pairs, J=41):
   forward relative error + cotangent-weighted gradient relative error for
   sphere_min_depth, d2m_nearest, and the fused sphere_min_depth_and_d2m.
   Both sides run on the TPU, so the comparison isolates Mosaic vs XLA
   lowering (geometry math is Precision.HIGHEST everywhere).

B. A fixed loss-stack fixture: value + gradient (w.r.t. per-view joints) of
   mutual_projection + mv_consistency + collision + bone_length on a
   deterministic batch — the full differentiable sphere path the combined
   train step drives (reference mesh/render.py:26-53,123-142,
   multiview_utility.py:80-167). The artifact stores the TPU numbers; the
   CPU test recomputes the same fixture through the XLA oracle path and
   compares (tight: no convs involved).

Reference semantics at stake: mesh/render.py:26-53,123-142.
Usage (TPU): python tools/tpu_sphere_parity.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

N, J, S = 225, 41, 64
B, V = 25, 3


def fixture():
    """Deterministic kernel-level fixture (matches tests/test_sphere_pallas.py
    scales: centers/joints in mm, observed maps with background 100)."""
    rng = np.random.RandomState(77)
    centers = jnp.asarray(rng.uniform(-80, 80, (N, J, 3)).astype(np.float32))
    radii = jnp.asarray(rng.uniform(4, 12, (J,)).astype(np.float32))
    w = jnp.asarray(rng.uniform(-1, 1, (N, S, S)).astype(np.float32))
    w2 = jnp.asarray(rng.uniform(-1, 1, (N, S, S)).astype(np.float32))
    z = jnp.full((N, S, S), 100.0, jnp.float32)
    z = z.at[:, 16:48, 16:48].set(
        jnp.asarray(rng.uniform(-60, 60, (N, 32, 32)).astype(np.float32))
    )
    return centers, radii, w, w2, z


def loss_fixture():
    """Deterministic loss-stack fixture: per-view joints + observed maps +
    rotation-only camera poses (the NYU convention the losses assume)."""
    rng = np.random.RandomState(99)
    joints = jnp.asarray(rng.uniform(-70, 70, (B, V, J, 3)).astype(np.float32))
    dms = np.full((B, V, S, S), 100.0, np.float32)
    dms[:, :, 12:52, 12:52] = rng.uniform(-60, 60, (B, V, 40, 40))
    angles = rng.uniform(-0.7, 0.7, (V,))
    poses = np.zeros((B, V, 4, 4), np.float32)
    poses[:, :, 3, 3] = 1.0
    for v in range(V):
        c, s = np.cos(angles[v]), np.sin(angles[v])
        poses[:, v, :3, :3] = np.asarray(
            [[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32
        )
    inv = np.swapaxes(poses, -1, -2)
    return joints, jnp.asarray(dms), jnp.asarray(poses), jnp.asarray(inv)


def stack_loss(joints, dms, poses, inv_poses, radii):
    """The differentiable sphere-path loss terms on fixed inputs (weights
    from losses/multitask.py LOSS_WEIGHTS, is_mv branch)."""
    from spherehand_tpu.losses.geometric import (
        bone_length_loss, collision_loss,
    )
    from spherehand_tpu.losses.multiview import (
        multiview_consistency_loss, mutual_projection_loss,
    )

    mv_proj, _ = mutual_projection_loss(
        poses, inv_poses, joints, dms, radii, is_mv=True
    )
    mv_cons = multiview_consistency_loss(poses, joints)
    flat = joints.reshape(B * V, J, 3)
    return mv_proj + 1e-3 * mv_cons + collision_loss(flat) + bone_length_loss(flat)


def main() -> None:
    assert jax.default_backend() != "cpu", (
        "this artifact must be captured on the real TPU chip"
    )
    from spherehand_tpu.render.sphere import (
        data_to_model_distance, render_spheres,
    )
    from spherehand_tpu.render.sphere_pallas import (
        d2m_nearest, sphere_min_depth, sphere_min_depth_and_d2m,
    )

    centers, radii, w, w2, z = fixture()
    stats = {}

    def rel(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return float(
            np.abs(a - b).max() / max(np.abs(b).max(), 1e-12)
        )

    # --- A. kernel-level compiled equivalence (both sides on the chip) ----
    def oracle_min_depth(c):
        return jnp.min(
            render_spheres(c, jnp.broadcast_to(radii, (N, J)), S), axis=-3
        )

    def oracle_d2m_field(c):
        # the XLA fallback in sphere.data_to_model_distance without the
        # clip/mean epilogue: reproduce via distance formula per sphere
        from spherehand_tpu.render.sphere import _mm_grid

        xg, yg = _mm_grid(S, S, jnp.float32)
        p_sq = xg * xg + yg * yg + z * z
        cx = c[..., 0, None, None]
        cy = c[..., 1, None, None]
        cz = c[..., 2, None, None]
        p_dot_c = xg * cx + yg * cy + z[..., None, :, :] * cz
        c_sq = jnp.sum(c * c, axis=-1)[..., None, None]
        sq = jnp.maximum(p_sq[..., None, :, :] - 2.0 * p_dot_c + c_sq, 1e-6)
        dist = jnp.abs(jnp.sqrt(sq) - radii[..., None, None])
        dist = jnp.where((z > 99.0)[..., None, :, :], 0.0, dist)
        return jnp.min(dist, axis=-3)

    f_min_o = jax.jit(lambda c: jnp.sum(w * oracle_min_depth(c)))
    f_min_k = jax.jit(lambda c: jnp.sum(w * sphere_min_depth(c, radii, S)))
    v_o, g_o = jax.value_and_grad(f_min_o)(centers)
    v_k, g_k = jax.value_and_grad(f_min_k)(centers)
    stats["min_depth_fwd_rel"] = rel(
        jax.jit(lambda c: sphere_min_depth(c, radii, S))(centers),
        jax.jit(oracle_min_depth)(centers),
    )
    stats["min_depth_grad_rel"] = rel(g_k, g_o)

    f_d2m_o = jax.jit(lambda c: jnp.sum(w2 * oracle_d2m_field(c)))
    f_d2m_k = jax.jit(lambda c: jnp.sum(w2 * d2m_nearest(z, c, radii, S)))
    vd_o, gd_o = jax.value_and_grad(f_d2m_o)(centers)
    vd_k, gd_k = jax.value_and_grad(f_d2m_k)(centers)
    stats["d2m_fwd_rel"] = rel(
        jax.jit(lambda c: d2m_nearest(z, c, radii, S))(centers),
        jax.jit(oracle_d2m_field)(centers),
    )
    stats["d2m_grad_rel"] = rel(gd_k, gd_o)

    def f_fused(c):
        d, m = sphere_min_depth_and_d2m(c, z, radii, S)
        return jnp.sum(w * d) + jnp.sum(w2 * m)

    def f_fused_o(c):
        return jnp.sum(w * oracle_min_depth(c)) + jnp.sum(
            w2 * oracle_d2m_field(c)
        )

    vf_k, gf_k = jax.value_and_grad(jax.jit(f_fused))(centers)
    vf_o, gf_o = jax.value_and_grad(jax.jit(f_fused_o))(centers)
    stats["fused_val_rel"] = rel(vf_k, vf_o)
    stats["fused_grad_rel"] = rel(gf_k, gf_o)

    # --- B. loss-stack fixture: TPU value + grad, CPU recomputes in test --
    joints, dms, poses, inv = loss_fixture()
    val, grad = jax.value_and_grad(
        lambda jts: stack_loss(jts, dms, poses, inv, radii)
    )(joints)
    stats["stack_loss"] = float(val)
    stats["stack_grad_norm"] = float(jnp.linalg.norm(grad))

    print(stats)
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "tests", "goldens",
        "tpu_sphere_parity.npz",
    )
    np.savez_compressed(
        out,
        **{k: np.float64(v) for k, v in stats.items()},
        stack_grad=np.asarray(grad)[:2],
        backend=np.bytes_(str(jax.devices()[0]).encode()),
    )
    print("wrote", out)


if __name__ == "__main__":
    main()
