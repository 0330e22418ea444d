"""combined_term_diag: per-term gradient attribution must be exact.

The divergence study (tools/divergence_study.py, PERF.md round 5) attributes
the stock-recipe collapse to a loss term using per-term parameter-gradient
norms. These tests pin the attribution math itself: the per-term gradients
(one-hot vjp cotangents off a shared forward) must sum to exactly the
gradient the production training step applies, and the reported values must
be the logged loss terms. Reference hot loop this instruments:
network/engine.py:318-436 (which never attributes its gradient).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax

from spherehand_tpu.train.config import EngineConfig
from spherehand_tpu.train.steps import RealBatch, build_steps


def _fake_batch(rng, b):
    dms = np.full((b, 3, 64, 64), 100.0, np.float32)
    dms[:, :, 24:40, 24:40] = rng.uniform(20, 60, (b, 3, 16, 16))
    return RealBatch(
        dms=jnp.asarray(dms),
        gt_joints=jnp.asarray(
            rng.uniform(-80, 80, (b, 3, 36, 3)).astype(np.float32)
        ),
        poses=jnp.tile(jnp.eye(4), (b, 3, 1, 1)),
        inv_poses=jnp.tile(jnp.eye(4), (b, 3, 1, 1)),
        weights=None,
    )


def test_term_grads_sum_to_total_and_values_match(hand_model):
    cfg = EngineConfig(synt_batch=8, real_batch=3, num_stacks=1)
    steps = build_steps(cfg, hand_model)
    state = steps.init_state(jax.random.key(0))
    batch = _fake_batch(np.random.RandomState(3), 3)
    key = jax.random.key(11)
    is_mv = jnp.asarray(True)

    diag = jax.jit(steps.combined_term_diag)(state, key, batch, is_mv)
    loss, grads = jax.jit(steps.combined_grads)(state, key, batch, is_mv)
    _, metrics, _ = jax.jit(steps.combined_step)(
        state, key, jnp.asarray(1e-3), batch, is_mv
    )

    # 1) total_grad_norm == global norm of the production step's gradient
    total = float(optax.global_norm(grads))
    np.testing.assert_allclose(
        float(diag["total_grad_norm"]), total, rtol=1e-4
    )

    # 2) every reported value is the logged loss term; they sum to the loss
    term_names = sorted(
        k.split("/")[0] for k in diag if k.endswith("/value")
    )
    assert len(term_names) >= 7  # full combined objective
    vsum = 0.0
    for name in term_names:
        np.testing.assert_allclose(
            float(diag[f"{name}/value"]), float(metrics[name]), rtol=1e-5
        )
        vsum += float(diag[f"{name}/value"])
    np.testing.assert_allclose(vsum, float(loss), rtol=1e-5)

    # 3) norm/cosine sanity: triangle inequality against the total, cosines
    #    in [-1, 1], and the Pythagorean identity sum_k <g_k, g> == |g|^2
    dot_sum = 0.0
    for name in term_names:
        n = float(diag[f"{name}/grad_norm"])
        c = float(diag[f"{name}/cos_total"])
        assert n >= 0.0
        assert -1.0 - 1e-5 <= c <= 1.0 + 1e-5
        dot_sum += c * n * total
    np.testing.assert_allclose(dot_sum, total * total, rtol=1e-3)

    # 4) Adam direction at fresh opt state: near-sign-vector, so its global
    #    norm is ~sqrt(param_count); param_norm positive
    assert float(diag["update_norm"]) > 0.0
    assert float(diag["param_norm"]) > 0.0


def test_term_diag_isolates_an_ablated_term(hand_model):
    """Ablating a term from the config removes exactly that key, and the
    remaining attribution still reconstructs its own total."""
    import dataclasses

    cfg = EngineConfig(synt_batch=8, real_batch=3, num_stacks=1)
    cfg_ab = dataclasses.replace(cfg, mv_projection=False)
    steps = build_steps(cfg_ab, hand_model)
    state = steps.init_state(jax.random.key(0))
    batch = _fake_batch(np.random.RandomState(3), 3)
    diag = jax.jit(steps.combined_term_diag)(
        state, jax.random.key(11), batch, jnp.asarray(True)
    )
    names = {k.split("/")[0] for k in diag if k.endswith("/value")}
    assert "mv_projection" not in names
    assert "mv_consistency" in names
