"""Engine integration: tiny combined-training run, checkpoint, eval (CPU)."""
import dataclasses
import json
import os

import numpy as np
import pytest

from spherehand_tpu.train.config import EngineConfig


def _write_fake_nyu(root, subset, num_samples=4):
    from spherehand_tpu.data.nyu import NyuDatasetGenerator

    rng = np.random.RandomState(0)
    d = os.path.join(root, subset)
    os.makedirs(d, exist_ok=True)
    gen = object.__new__(NyuDatasetGenerator)
    gen.npy_dir = d
    dms = np.full((num_samples, 3, 64, 64), 100.0, np.float32)
    dms[:, :, 24:44, 24:44] = rng.uniform(20, 60, (num_samples, 3, 20, 20))
    joints = rng.uniform(-80, 80, (num_samples, 3, 36, 3)).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (num_samples, 3, 1, 1))
    gen._write_shard("mv_data_0", dms, joints, poses)


@pytest.mark.slow
def test_engine_combined_train_checkpoint_eval(tmp_path):
    from spherehand_tpu.train.engine import Engine

    data_dir = str(tmp_path / "nyu")
    _write_fake_nyu(data_dir, "train")
    _write_fake_nyu(data_dir, "test")
    cfg = EngineConfig(
        mode="Train",
        model_dir=str(tmp_path / "runs"),
        dataset_dir=data_dir,
        epoch=1,
        num_stacks=1,
        real_batch=2,
        synt_batch=4,
        eval_batch=2,
        tag="t_",
    )
    engine = Engine(cfg)
    engine.train()  # 2 iterations over the fake dataset + checkpoints
    assert int(engine.state.step) == 2

    run_dir = engine.model_path
    assert os.path.exists(os.path.join(run_dir, "loss_weights.txt"))
    assert os.path.exists(os.path.join(run_dir, "model_0"))
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        records = [json.loads(line) for line in f]
    assert any(r["mode"] == "both" and np.isfinite(r["loss"]) for r in records)

    # Full resume restores epoch + optimizer; weights-only keeps epoch 0.
    resume_cfg = dataclasses.replace(
        cfg, restore_from_model=engine.model_name, restore_from_epoch=0
    )
    resumed = Engine(resume_cfg)
    assert resumed.starting_epoch == 0
    assert int(resumed.state.step) == 2
    leaf0 = np.asarray(
        next(iter(np.asarray(x) for x in _leaves(engine.state.params)))
    )
    leaf1 = np.asarray(
        next(iter(np.asarray(x) for x in _leaves(resumed.state.params)))
    )
    np.testing.assert_array_equal(leaf0, leaf1)

    # Eval runs end-to-end and reports the denoised view-0 metric.
    result = resumed.eval()
    assert np.isfinite(result["avg_joint_error"])


def _leaves(tree):
    import jax

    return jax.tree.leaves(tree)


@pytest.mark.slow
def test_engine_synthetic_only_epoch(tmp_path):
    """Synthetic-only pretraining path (engine.py:265-316 equivalent)."""
    from spherehand_tpu.train.engine import Engine

    cfg = EngineConfig(
        mode="Train",
        model_dir=str(tmp_path / "runs"),
        dataset_dir=str(tmp_path / "none"),  # must not be touched
        epoch=1,
        num_stacks=1,
        synt_batch=4,
        synt_iters_per_epoch=2,
        # disable all real-data losses -> synthetic-only mode
        mv_projection=False,
        mv_consistency=False,
        prior=False,
        collision=False,
        bone_length=False,
        tag="s_",
    )
    engine = Engine(cfg)
    assert not cfg.with_real
    engine.train()
    assert int(engine.state.step) == 2
    with open(os.path.join(engine.model_path, "metrics.jsonl")) as f:
        records = [json.loads(line) for line in f]
    assert any(r["mode"] == "synt" for r in records)


@pytest.mark.slow
def test_engine_real_only_epoch(tmp_path):
    """Real-data-only self-supervised path (engine.py:150-263, Train mode)."""
    from spherehand_tpu.train.engine import Engine

    data_dir = str(tmp_path / "nyu")
    _write_fake_nyu(data_dir, "train")
    cfg = EngineConfig(
        mode="Train",
        model_dir=str(tmp_path / "runs"),
        dataset_dir=data_dir,
        epoch=1,
        num_stacks=1,
        eval_batch=2,  # real-only epoch uses bs=8 default; use 2 here
        synthesize=False,
        tag="r_",
    )
    engine = Engine(cfg)
    assert cfg.with_real and not cfg.synthesize
    engine.train()
    assert int(engine.state.step) == 2
    with open(os.path.join(engine.model_path, "metrics.jsonl")) as f:
        records = [json.loads(line) for line in f]
    assert any(r["mode"] == "real" and np.isfinite(r["loss"]) for r in records)


@pytest.mark.slow
def test_acc_wrapper_matches_plain_steps(tmp_path):
    """The accumulating jit wrapper (key derivation + metric sums inside the
    program) reproduces the plain per-step path: same params, and the sums
    equal the sum of per-step metrics."""
    import jax
    import jax.numpy as jnp

    from spherehand_tpu.train.engine import Engine

    cfg = EngineConfig(
        mode="Train", model_dir=str(tmp_path / "runs"), epoch=1,
        num_stacks=1, synt_batch=2, synt_iters_per_epoch=3,
        mv_projection=False, mv_consistency=False, prior=False,
        collision=False, bone_length=False, tag="a_",
    )
    eng = Engine(cfg)
    lr = jnp.asarray(1e-3)

    # plain path: eager fold_in keys + host accumulation
    state_a = eng.state
    plain_sums = None
    for it in range(3):
        state_a, metrics = eng._jit_synt(state_a, eng._step_key(0, it), lr)
        m = {k: np.asarray(v) for k, v in metrics.items()}
        plain_sums = m if plain_sums is None else {
            k: plain_sums[k] + v for k, v in m.items()
        }

    # acc path from the same initial state
    eng2 = Engine(dataclasses.replace(cfg, tag="b_"))
    sums = eng2._metric_zeros(
        "synt", lambda: jax.eval_shape(
            eng2.steps.synt_step, eng2.state, eng2.base_key, lr)[1],
    )
    state_b = eng2.state
    for it in range(3):
        state_b, _, sums = eng2._jit_synt_acc(
            state_b, eng2.base_key, np.asarray([0, it], np.int32), lr, sums)

    leaves_a = jax.tree.leaves(state_a.params)
    leaves_b = jax.tree.leaves(state_b.params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    got = jax.device_get(sums)
    for k in plain_sums:
        np.testing.assert_allclose(got[k], plain_sums[k], rtol=1e-6)


@pytest.mark.slow
def test_steps_per_call_scan_matches_per_step(tmp_path):
    """--steps_per_call K scans K combined steps per dispatch with the same
    per-it keys, batches and curriculum compares as K=1. A wrong key, batch
    order or curriculum flag would change the LOSSES outright, so the sums
    are compared tightly; params only to f32-rounding tolerance (the scanned
    step's backward compiles with a different reduction order, and Adam
    amplifies ulp-level gradient differences)."""
    import jax
    import jax.numpy as jnp

    from spherehand_tpu.train.engine import Engine

    data_dir = str(tmp_path / "nyu")
    _write_fake_nyu(data_dir, "train", num_samples=6)
    base = dict(
        mode="Train", model_dir=str(tmp_path / "runs"), dataset_dir=data_dir,
        epoch=1, num_stacks=1, real_batch=2, synt_batch=2,
        # is_mv flips INSIDE the K=2 chunk ([True, False]): a regression
        # that computes the curriculum flag once per chunk changes the
        # second step's loss and fails the sums comparison below
        mv_curriculum_iters=1,
    )
    lr = jnp.asarray(1e-3)
    eng1 = Engine(EngineConfig(**base, tag="k1_", steps_per_call=1))
    loader = eng1._real_loader(train=True, batch_size=2)
    raws = list(loader)[:2]

    sums0 = eng1._metric_zeros(
        "combined",
        lambda: jax.eval_shape(
            eng1.steps.combined_step, eng1.state, eng1.base_key, lr,
            eng1._put_batch(raws[0]), jnp.asarray(True))[1],
    )
    state = eng1.state
    sums_a = dict(sums0)
    for it, raw in enumerate(raws):
        state, _, _, sums_a = eng1._jit_combined_acc(
            state, eng1.base_key, np.asarray([0, it], np.int32), lr,
            eng1._put_batch(raw), sums_a,
        )

    eng2 = Engine(EngineConfig(**base, tag="k2_", steps_per_call=2))
    batches = eng2._put_batches(raws)
    state2, _, _, sums_b = eng2._jit_combined_scan(
        eng2.state, eng2.base_key, np.int32(0),
        jnp.asarray([0, 1], jnp.int32), lr, batches, dict(sums0),
    )

    assert int(state.step) == int(state2.step) == 2
    got_a, got_b = jax.device_get(sums_a), jax.device_get(sums_b)
    for k in got_a:  # forward losses reproduce to float tolerance
        np.testing.assert_allclose(got_b[k], got_a[k], rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3
        )
