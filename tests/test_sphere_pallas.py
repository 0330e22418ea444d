"""Fused sphere kernels (render/sphere_pallas.py) vs the pure-XLA oracle.

The XLA path in render/sphere.py is the golden-tested reference semantics
(mesh/render.py:26-53,89,123-142); the fused kernels must reproduce its
forward to fp-contraction ulps and its gradients to ~1e-5 relative
(subgradient choice at exact sphere ties is the only structural
difference). Compiled-TPU equivalence is a CHECKED-IN artifact
(tests/goldens/tpu_sphere_parity.npz, captured by tools/tpu_sphere_parity.py
at N=225, J=41 for the factored-backward kernels AND the fused
sphere_min_depth_and_d2m op: fwd bit-identical, grad rel 6-8e-7), asserted
by test_tpu_compiled_sphere_artifact below together with a CPU oracle
recompute of the captured loss-stack fixture.
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


def test_primal_only_kernels_match_vjp_forward():
    """Non-differentiated calls route through single-output primal kernels
    (no argmin/weight residual planes — pallas outputs can't be DCE'd);
    they must be bit-identical to the forward the VJP path uses."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spherehand_tpu.render.sphere_pallas import (
        _d2m_fwd, _min_depth_fwd, d2m_nearest, sphere_min_depth,
    )

    rng = np.random.RandomState(11)
    n, j, size = 6, 41, 64
    centers = jnp.asarray(rng.uniform(-80, 80, (n, j, 3)).astype(np.float32))
    radii = jnp.asarray(rng.uniform(3, 12, (j,)).astype(np.float32))
    dms = jnp.asarray(
        np.where(rng.rand(n, size, size) < 0.5,
                 rng.uniform(-90, 90, (n, size, size)),
                 100.0).astype(np.float32)
    )

    primal = sphere_min_depth(centers, radii, size, True)
    fwd, _ = _min_depth_fwd(centers, radii, size, True)
    np.testing.assert_array_equal(np.asarray(primal), np.asarray(fwd))

    primal_d = d2m_nearest(dms, centers, radii, size, True)
    fwd_d, _ = _d2m_fwd(dms, centers, radii, size, True)
    np.testing.assert_array_equal(np.asarray(primal_d), np.asarray(fwd_d))


def test_fused_min_depth_and_d2m_matches_standalone():
    """The fused mutual-projection kernel (one pass producing BOTH loss
    fields + one summed-gradient backward) must reproduce the standalone
    sphere_min_depth / d2m_nearest ops bit-for-bit forward and match their
    combined gradient."""
    from spherehand_tpu.render.sphere_pallas import sphere_min_depth_and_d2m

    centers, radii, w, z = _fixtures()
    depth_s = sphere_min_depth(centers, radii, S, True)
    dist_s = d2m_nearest(z, centers, radii, S, True)
    depth_f, dist_f = sphere_min_depth_and_d2m(centers, z, radii, S, True)
    np.testing.assert_array_equal(np.asarray(depth_f), np.asarray(depth_s))
    np.testing.assert_array_equal(np.asarray(dist_f), np.asarray(dist_s))

    w2 = jnp.roll(w, 1, axis=-1)  # distinct cotangents for the two fields

    def f_sep(c):
        return jnp.sum(w * sphere_min_depth(c, radii, S, True)) + jnp.sum(
            w2 * d2m_nearest(z, c, radii, S, True)
        )

    def f_fused(c):
        d, m = sphere_min_depth_and_d2m(c, z, radii, S, True)
        return jnp.sum(w * d) + jnp.sum(w2 * m)

    g_sep = np.asarray(jax.grad(f_sep)(centers))
    g_fused = np.asarray(jax.grad(f_fused)(centers))
    scale = max(np.abs(g_sep).max(), 1e-6)
    np.testing.assert_allclose(g_fused, g_sep, atol=2e-5 * scale)


def test_fused_op_matches_xla_loss_path():
    """mutual_projection_loss's fused-branch math (clip + bmean + diag sv
    reuse) equals the unfused XLA branch, values AND gradients."""
    from spherehand_tpu.ops.reduce import bmean, bmean_keep
    from spherehand_tpu.render.sphere import data_to_model_distance
    from spherehand_tpu.render.sphere_pallas import sphere_min_depth_and_d2m

    rng = np.random.RandomState(3)
    b, v, j = 2, 3, J
    joints = jnp.asarray(rng.uniform(-70, 70, (b, v, v, j, 3)).astype(np.float32))
    radii = jnp.asarray(rng.uniform(4, 12, (j,)).astype(np.float32))
    real = jnp.full((b, v, S, S), 100.0, jnp.float32)
    real = real.at[:, :, 16:48, 16:48].set(
        jnp.asarray(rng.uniform(-60, 60, (b, v, 32, 32)).astype(np.float32))
    )
    target = jnp.broadcast_to(real[:, None], (b, v, v, S, S))
    diag = jnp.arange(v)

    def terms_xla(pj):
        d2m_mv = data_to_model_distance(target, pj, radii, None) * 9.0
        jd = pj[:, diag, diag]
        d2m_sv = sum(
            data_to_model_distance(real[:, k], jd[:, k], radii, None)
            for k in range(v)
        ) * 3.0
        return d2m_mv + 0.37 * d2m_sv

    def terms_fused(pj):
        _, dist = sphere_min_depth_and_d2m(
            pj.reshape(b * v * v, j, 3),
            target.reshape(b * v * v, S, S), radii, S, True,
        )
        field = jnp.clip(dist.reshape(b, v, v, S, S), 0.0, 50.0)
        d2m_mv = bmean(field, None) * 9.0
        d2m_sv = jnp.sum(bmean_keep(field[:, diag, diag], None, (2, 3))) * 3.0
        return d2m_mv + 0.37 * d2m_sv

    v_x, g_x = jax.value_and_grad(terms_xla)(joints)
    v_f, g_f = jax.value_and_grad(terms_fused)(joints)
    np.testing.assert_allclose(float(v_f), float(v_x), rtol=1e-6)
    scale = max(np.abs(np.asarray(g_x)).max(), 1e-6)
    np.testing.assert_allclose(
        np.asarray(g_f), np.asarray(g_x), atol=2e-5 * scale
    )


def test_tpu_compiled_sphere_artifact():
    """On-chip Mosaic-compiled sphere kernels vs the XLA oracle (captured
    artifact, tools/tpu_sphere_parity.py) — the compiled counterpart of the
    interpret-mode tests above — plus a CPU recompute of the captured
    loss-stack fixture through the oracle path (no convs, so the comparison
    is tight: the sphere kernels and reduction orders are the only
    difference)."""
    import os
    import sys

    path = os.path.join(
        os.path.dirname(__file__), "goldens", "tpu_sphere_parity.npz"
    )
    if not os.path.exists(path):
        import pytest

        pytest.skip("on-chip artifact not captured")
    art = np.load(path)
    assert b"TPU" in bytes(art["backend"])
    # Forward lowering is bit-identical on chip; gradients match the XLA
    # oracle's autodiff to ~1e-6 relative (ties aside, measure-zero).
    assert float(art["min_depth_fwd_rel"]) == 0.0
    assert float(art["d2m_fwd_rel"]) == 0.0
    assert float(art["min_depth_grad_rel"]) < 1e-5
    assert float(art["d2m_grad_rel"]) < 1e-5
    assert float(art["fused_val_rel"]) < 1e-5
    assert float(art["fused_grad_rel"]) < 1e-5

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "tools")
    )
    from tpu_sphere_parity import fixture, loss_fixture, stack_loss

    _, radii, _, _, _ = fixture()
    joints, dms, poses, inv = loss_fixture()
    val, grad = jax.value_and_grad(
        lambda jts: stack_loss(jts, dms, poses, inv, radii)
    )(joints)
    tpu_loss = float(art["stack_loss"])
    tpu_gn = float(art["stack_grad_norm"])
    assert abs(float(val) - tpu_loss) / tpu_loss < 2e-4, (float(val), tpu_loss)
    gn = float(jnp.linalg.norm(grad))
    assert abs(gn - tpu_gn) / tpu_gn < 1e-3, (gn, tpu_gn)
    scale = np.abs(np.asarray(art["stack_grad"])).max()
    np.testing.assert_allclose(
        np.asarray(grad)[:2], art["stack_grad"], atol=1e-4 * scale
    )
