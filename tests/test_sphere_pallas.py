"""Fused sphere kernels (render/sphere_pallas.py) vs the pure-XLA oracle.

The XLA path in render/sphere.py is the golden-tested reference semantics
(mesh/render.py:26-53,89,123-142); the fused kernels must reproduce its
forward to fp-contraction ulps and its gradients to ~1e-5 relative
(subgradient choice at exact sphere ties is the only structural
difference). Compiled-TPU equivalence was additionally measured at
N=225, J=41: fwd rel ~1e-7, grad rel <1e-6 over all elements (PERF.md
round 4).
"""
import numpy as np

import jax
import jax.numpy as jnp

from spherehand_tpu.render.sphere import (
    _fuse_spheres,
    _mm_grid,
    render_spheres,
)
from spherehand_tpu.render.sphere_pallas import d2m_nearest, sphere_min_depth

N, J, S = 3, 41, 64


def _fixtures():
    rng = np.random.RandomState(7)
    centers = jnp.asarray(rng.uniform(-80, 80, (N, J, 3)).astype(np.float32))
    radii = jnp.asarray(rng.uniform(4, 12, (J,)).astype(np.float32))
    w = jnp.asarray(rng.uniform(-1, 1, (N, S, S)).astype(np.float32))
    z = jnp.full((N, S, S), 100.0, jnp.float32)
    z = z.at[:, 16:48, 16:48].set(
        jnp.asarray(rng.uniform(-60, 60, (N, 32, 32)).astype(np.float32))
    )
    return centers, radii, w, z


def test_cpu_keeps_the_oracle_path():
    # The goldens pin the XLA path; CPU must not route through the kernels.
    assert jax.default_backend() == "cpu"
    assert not _fuse_spheres(S)


def test_min_depth_matches_oracle():
    centers, radii, w, _ = _fixtures()
    ref = jnp.min(
        render_spheres(centers, jnp.broadcast_to(radii, (N, J)), S), axis=-3
    )
    ours = sphere_min_depth(centers, radii, S, True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-4)

    f_ref = lambda c: jnp.sum(
        w * jnp.min(
            render_spheres(c, jnp.broadcast_to(radii, (N, J)), S), axis=-3
        )
    )
    f_new = lambda c: jnp.sum(w * sphere_min_depth(c, radii, S, True))
    g_ref = np.asarray(jax.grad(f_ref)(centers))
    g_new = np.asarray(jax.grad(f_new)(centers))
    scale = np.abs(g_ref).max()
    np.testing.assert_allclose(g_new, g_ref, atol=1e-4 * scale)


def test_d2m_matches_oracle():
    centers, radii, w, z = _fixtures()

    def ref_nearest(c):
        xg, yg = _mm_grid(S, S, z.dtype)
        p_sq = xg * xg + yg * yg + z * z
        cx = c[..., 0, None, None]
        cy = c[..., 1, None, None]
        cz = c[..., 2, None, None]
        pdc = xg * cx + yg * cy + z[..., None, :, :] * cz
        c_sq = jnp.sum(c * c, axis=-1)[..., None, None]
        sq = jnp.maximum(p_sq[..., None, :, :] - 2.0 * pdc + c_sq, 1e-6)
        dist = jnp.abs(jnp.sqrt(sq) - radii[..., None, None])
        dist = jnp.where((z > 99.0)[..., None, :, :], 0.0, dist)
        return jnp.min(dist, axis=-3)

    ref = ref_nearest(centers)
    ours = d2m_nearest(z, centers, radii, S, True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-3)

    g_ref = np.asarray(
        jax.grad(lambda c: jnp.sum(w * ref_nearest(c)))(centers)
    )
    g_new = np.asarray(
        jax.grad(lambda c: jnp.sum(w * d2m_nearest(z, c, radii, S, True)))(
            centers
        )
    )
    scale = np.abs(g_ref).max()
    np.testing.assert_allclose(g_new, g_ref, atol=1e-4 * scale)
    # depth is data at every call site: its cotangent must be exactly zero
    gz = jax.grad(
        lambda d: jnp.sum(w * d2m_nearest(d, centers, radii, S, True))
    )(z)
    assert float(jnp.abs(gz).max()) == 0.0


def test_min_depth_grad_second_seed():
    """Gradient equivalence on an independent pose draw.

    (A finite-difference check is NOT meaningful for the raw min-depth
    field: it is discontinuous at silhouette boundaries — depth jumps to
    the 100 mm background as a sphere edge crosses a pixel — so FD
    measures silhouette crossings, not the smooth gradient. The reference
    autograd has the same semantics: zero gradient outside silhouettes,
    mesh/render.py:41-52. The contract is therefore autodiff-vs-oracle
    equivalence, which the d2m FD checks in tests/test_gradients.py
    complement on the smooth loss.)"""
    rng = np.random.RandomState(123)
    centers = jnp.asarray(rng.uniform(-60, 60, (N, J, 3)).astype(np.float32))
    radii = jnp.asarray(rng.uniform(6, 14, (J,)).astype(np.float32))
    w = jnp.asarray(rng.uniform(-1, 1, (N, S, S)).astype(np.float32))
    f_ref = lambda c: jnp.sum(
        w * jnp.min(
            render_spheres(c, jnp.broadcast_to(radii, (N, J)), S), axis=-3
        )
    )
    f_new = lambda c: jnp.sum(w * sphere_min_depth(c, radii, S, True))
    g_ref = np.asarray(jax.grad(f_ref)(centers))
    g_new = np.asarray(jax.grad(f_new)(centers))
    np.testing.assert_allclose(g_new, g_ref, atol=1e-4 * np.abs(g_ref).max())
