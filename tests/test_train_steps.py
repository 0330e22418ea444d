"""End-to-end train/eval step smoke + behavior tests (tiny shapes, CPU)."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spherehand_tpu.train.config import EngineConfig
from spherehand_tpu.train.steps import RealBatch, build_steps


@pytest.fixture(scope="module")
def tiny_cfg():
    return EngineConfig(synt_batch=4, real_batch=2, num_stacks=1, epoch=75)


@pytest.fixture(scope="module")
def steps(tiny_cfg, hand_model_module):
    return build_steps(tiny_cfg, hand_model_module)


@pytest.fixture(scope="module")
def hand_model_module():
    from spherehand_tpu.hand.assets import load_hand_model

    return load_hand_model()


def _fake_real_batch(rng, batch=2, views=3):
    dms = np.full((batch, views, 64, 64), 100.0, np.float32)
    dms[:, :, 20:40, 20:40] = rng.uniform(20, 60, (batch, views, 20, 20))
    gt = rng.uniform(-80, 80, (batch, views, 36, 3)).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (batch, views, 1, 1))
    return RealBatch(
        dms=jnp.asarray(dms),
        gt_joints=jnp.asarray(gt),
        poses=jnp.asarray(poses),
        inv_poses=jnp.asarray(poses),
    )


def test_synt_step_trains(steps):
    state = steps.init_state(jax.random.key(0))
    step = jax.jit(steps.synt_step)
    metrics_hist = []
    for i in range(3):
        state, metrics = step(state, jax.random.key(i + 1), jnp.asarray(1e-3))
        metrics_hist.append({k: float(v) for k, v in metrics.items()})
    assert int(state.step) == 3
    for m in metrics_hist:
        assert np.isfinite(m["loss"]), m
        assert m["synt_uv"] > 0
    # params actually moved
    leaf = jax.tree.leaves(state.params)[0]
    assert np.abs(np.asarray(leaf)).sum() > 0


def test_combined_step_runs_and_is_finite(steps):
    state = steps.init_state(jax.random.key(0))
    rng = np.random.RandomState(3)
    batch = _fake_real_batch(rng)
    step = jax.jit(steps.combined_step)
    state, metrics, vis = step(
        state, jax.random.key(5), jnp.asarray(1e-3), batch, jnp.asarray(True)
    )
    assert vis["synt_dms"].shape[0] == 4
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    expected = {
        "loss", "synt_uv", "synt_d", "mv_projection", "mv_consistency",
        "uv_hm_mean", "pose_prior", "collision", "bone_length",
        "domain_loss", "avg_joint_error",
    }
    assert expected <= set(metrics)
    # is_mv=False path also compiles and runs
    state, metrics2, _ = step(
        state, jax.random.key(6), jnp.asarray(1e-3), batch, jnp.asarray(False)
    )
    assert np.isfinite(float(metrics2["loss"]))


def test_eval_step(steps):
    state = steps.init_state(jax.random.key(0))
    batch = _fake_real_batch(np.random.RandomState(4))
    metrics, denoised = jax.jit(steps.eval_step)(
        state.params, jax.random.key(9), batch
    )
    assert np.isfinite(float(metrics["avg_joint_error"]))
    assert denoised.shape == (2, 41, 3)


def test_lr_schedule(tiny_cfg):
    cfg = dataclasses.replace(tiny_cfg, epoch=75, lr=1e-3)
    assert cfg.lr_at_epoch(0) == pytest.approx(1e-3)
    assert cfg.lr_at_epoch(24) == pytest.approx(1e-3)
    assert cfg.lr_at_epoch(25) == pytest.approx(1e-4)
    assert cfg.lr_at_epoch(50) == pytest.approx(1e-5)


def test_synt_step_deterministic(steps):
    """Same seed -> identical loss (explicit RNG, no hidden state)."""
    m = []
    for _ in range(2):
        state = steps.init_state(jax.random.key(0))
        state, metrics = jax.jit(steps.synt_step)(
            state, jax.random.key(7), jnp.asarray(1e-3)
        )
        m.append(float(metrics["loss"]))
    assert m[0] == m[1]
