"""Data-parallel sharding: padded sharded steps match single-device exactly.

The engine pads batches whose leading axis does not divide the mesh with
duplicate rows at loss-weight 0 (spherehand_tpu.ops.reduce), so the sharded
objective is EXACTLY the single-device one at any device count — including
the reference default geometry 25/48/8 on 8 chips. These tests run on the
simulated 8-device CPU mesh (conftest.py).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from spherehand_tpu.parallel import batch_sharding, data_mesh, replicated, shard_batch
from spherehand_tpu.train.config import EngineConfig
from spherehand_tpu.train.steps import RealBatch, build_steps


def _fake_batch(rng, b, pad_to=None):
    dms = np.full((b, 3, 64, 64), 100.0, np.float32)
    dms[:, :, 24:40, 24:40] = rng.uniform(20, 60, (b, 3, 16, 16))
    batch = dict(
        dms=dms,
        gt_joints=rng.uniform(-80, 80, (b, 3, 36, 3)).astype(np.float32),
        poses=np.tile(np.eye(4, dtype=np.float32), (b, 3, 1, 1)),
        inv_poses=np.tile(np.eye(4, dtype=np.float32), (b, 3, 1, 1)),
        weights=None,
    )
    if pad_to is not None and pad_to > b:
        idx = np.concatenate([np.arange(b), np.arange(pad_to - b) % b])
        for k in ("dms", "gt_joints", "poses", "inv_poses"):
            batch[k] = batch[k][idx]
        w = np.zeros(pad_to, np.float32)
        w[:b] = 1.0
        batch["weights"] = w
    return batch


def _put(batch_np, mesh):
    sh = batch_sharding(mesh)
    return RealBatch(**{
        k: None if v is None else jax.device_put(v, sh)
        for k, v in batch_np.items()
    })


def test_padded_sharded_combined_matches_single_device(hand_model):
    """3 combined steps: 8-device real-padded (real 3->8) vs 1-device
    unpadded — identical losses and (to Adam float noise) identical params.

    synt_batch is kept mesh-divisible (as the stock 48 is on 8 devices):
    synthetic padding draws a different keyed random stream (a batch-shaped
    draw), which is legitimate but not comparable row-for-row; its zero-
    leakage guarantee is unit-tested in test_weighted_losses.py instead."""
    cfg = EngineConfig(synt_batch=8, real_batch=3, num_stacks=1)
    rng = np.random.RandomState(0)
    raw = [_fake_batch(np.random.RandomState(100 + i), 3) for i in range(3)]

    def run(devices, pad):
        mesh = data_mesh(devices)
        n = len(devices)
        steps = build_steps(
            cfg,
            hand_model,
            synt_pad=0,
            data_sharding=batch_sharding(mesh) if n > 1 else None,
        )
        state = jax.device_put(
            steps.init_state(jax.random.key(0)), replicated(mesh)
        )
        step = jax.jit(steps.combined_step)
        losses = []
        for i, b in enumerate(raw):
            batch_np = dict(b)
            if pad:
                batch_np = _fake_batch(np.random.RandomState(100 + i), 3,
                                       pad_to=n * ((3 + n - 1) // n))
            batch = _put(batch_np, mesh)
            state, metrics, _ = step(
                state, jax.random.key(7 + i), jnp.asarray(1e-3), batch,
                jnp.asarray(True),
            )
            losses.append(float(metrics["loss"]))
        return losses, state

    losses1, state1 = run(jax.devices()[:1], pad=False)
    losses8, state8 = run(jax.devices()[:8], pad=True)
    # Step 0 runs on identical params: the padded objective must match to
    # float reduction noise (measured gradient agreement is ~1e-6 relative).
    np.testing.assert_allclose(losses1[0], losses8[0], rtol=2e-4)
    # Later steps see Adam sign-noise amplification: psum reduction order
    # perturbs near-zero gradients by ~1e-6, and Adam's first-step
    # update is +-lr regardless of gradient magnitude, so those weights
    # step in opposite directions. Drift is bounded by steps * 2 * lr.
    assert np.all(np.isfinite(losses8))
    np.testing.assert_allclose(losses1, losses8, rtol=0.15)
    for a, b in zip(jax.tree.leaves(state1.params), jax.tree.leaves(state8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-2)


def test_padded_sharded_gradients_match_single_device(hand_model):
    """Pre-optimizer GRADIENTS of the combined objective: 8-device padded
    (real 3->8 with zero-weight rows) vs 1-device unpadded, at identical
    params. This is the airtight form of the "exact same objective" claim —
    post-Adam param comparisons amplify float-level psum reduction noise
    through the sign-like first-step update (see the step test above).

    real_aug=False: the resize-crop aug draws per-row randomness whose draw
    COUNT is the padded flat batch size, and threefry pairs counters
    (i, i + n/2), so the same real row sees different aug at different
    paddings — legitimate (training is stochastic) but not comparable
    row-for-row. The VAE prior is already per-row fold_in-stable by design
    (pose_vae.py:55-62). With aug off the objective is deterministic and the
    comparison is float-noise-tight."""
    import functools

    cfg = EngineConfig(synt_batch=8, real_batch=3, num_stacks=1)

    def run(devices, pad):
        mesh = data_mesh(devices)
        n = len(devices)
        steps = build_steps(
            cfg,
            hand_model,
            synt_pad=0,
            data_sharding=batch_sharding(mesh) if n > 1 else None,
        )
        state = jax.device_put(
            steps.init_state(jax.random.key(0)), replicated(mesh)
        )
        batch_np = _fake_batch(np.random.RandomState(100), 3,
                               pad_to=8 if pad else None)
        batch = _put(batch_np, mesh)
        loss, grads = jax.jit(
            functools.partial(steps.combined_grads, real_aug=False)
        )(state, jax.random.key(7), batch, jnp.asarray(True))
        return float(loss), jax.device_get(grads)

    loss_u1, g_u1 = run(jax.devices()[:1], pad=False)
    loss_p1, g_p1 = run(jax.devices()[:1], pad=True)
    loss_p8, g_p8 = run(jax.devices()[:8], pad=True)

    def assert_grads_close(ga, gb, tol, what):
        flat_a = jax.tree_util.tree_leaves_with_path(ga)
        flat_b = jax.tree.leaves(gb)
        assert len(flat_a) == len(flat_b) > 0
        for (path, a), b in zip(flat_a, flat_b):
            a, b = np.asarray(a), np.asarray(b)
            # rtol for the signal; atol floors the comparison at noise
            # relative to the leaf's own gradient scale (near-zero entries
            # of a leaf whose large values are O(s) carry noise O(s * tol)).
            scale = max(np.abs(a).max(), 1e-30)
            np.testing.assert_allclose(
                a, b, rtol=tol, atol=scale * tol,
                err_msg=f"{what}: {jax.tree_util.keystr(path)}",
            )

    # Claim 1 — padding is EXACT: zero-weight duplicate rows change the
    # objective's gradients only at f32 reduction-noise level on the same
    # device layout (measured worst leaf 9e-6 rel-to-scale).
    np.testing.assert_allclose(loss_u1, loss_p1, rtol=1e-6)
    assert_grads_close(g_u1, g_p1, 1e-4, "padding semantics (1 device)")
    # Claim 2 — the 8-way sharded execution computes the same gradients up
    # to reduction-order noise: per-shard partial sums + the psum reorder
    # f32 accumulation (measured worst leaf 1.2e-3 rel-to-scale on conv
    # reductions with heavy cancellation). The loss itself matches tightly.
    np.testing.assert_allclose(loss_p1, loss_p8, rtol=1e-6)
    assert_grads_close(g_p1, g_p8, 5e-3, "sharded execution (8 devices)")
    cfg = EngineConfig(synt_batch=5, real_batch=3, num_stacks=1)
    raw = _fake_batch(np.random.RandomState(3), 3)

    def run(devices, pad):
        mesh = data_mesh(devices)
        n = len(devices)
        steps = build_steps(cfg, hand_model)
        params = steps.init_state(jax.random.key(0)).params
        params = jax.device_put(params, replicated(mesh))
        batch_np = (
            _fake_batch(np.random.RandomState(3), 3, pad_to=8) if pad else raw
        )
        batch = _put(batch_np, mesh)
        metrics, denoised = jax.jit(steps.eval_step)(
            params, jax.random.key(1), batch
        )
        return {k: float(v) for k, v in metrics.items()}, np.asarray(denoised)

    m1, d1 = run(jax.devices()[:1], pad=False)
    m8, d8 = run(jax.devices()[:8], pad=True)
    for k in m1:
        np.testing.assert_allclose(m1[k], m8[k], rtol=2e-4, err_msg=k)
    np.testing.assert_allclose(d1, d8[:3], rtol=1e-4, atol=1e-4)


def test_sharded_checkpoint_roundtrip(hand_model, tmp_path):
    """Orbax save/restore of a mesh-replicated TrainState round-trips."""
    import orbax.checkpoint as ocp

    cfg = EngineConfig(synt_batch=8, real_batch=4, num_stacks=1)
    steps = build_steps(cfg, hand_model)
    mesh = data_mesh(jax.devices()[:8])
    state = jax.device_put(
        steps.init_state(jax.random.key(0)), replicated(mesh)
    )
    path = str(tmp_path / "ckpt")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
        restored = ckptr.restore(path, state)
    restored = jax.device_put(restored, replicated(mesh))
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_engine_uses_all_devices_at_stock_geometry(tmp_path):
    """The reference default batch geometry (25/48/8) no longer degrades the
    engine to one device: padding + weighted losses admit the full mesh."""
    from spherehand_tpu.train.engine import Engine

    cfg = EngineConfig(
        mode="Train",
        model_dir=str(tmp_path / "runs"),
        dataset_dir=str(tmp_path / "none"),
        num_stacks=1,
        tag="p_",
    )
    assert (cfg.real_batch, cfg.synt_batch, cfg.eval_batch) == (25, 48, 8)
    engine = Engine(cfg)
    assert engine._n_devices == len(jax.devices()) == 8
    assert engine.mesh.devices.size == 8
    # padded real batch shards 25 -> 32 with 7 zero-weight rows
    batch = engine._put_batch(
        tuple(_fake_batch(np.random.RandomState(0), 25).values())[:4]
    )
    assert batch.dms.shape[0] == 32
    assert float(np.asarray(batch.weights).sum()) == 25.0
    assert batch.dms.sharding.is_equivalent_to(
        NamedSharding(engine.mesh, P("data")), batch.dms.ndim
    )


@pytest.mark.slow
def test_sharded_step_matches_single_device(hand_model):
    """Divisible geometry (no padding): 4-device vs 1-device agreement."""
    cfg = EngineConfig(synt_batch=8, real_batch=4, num_stacks=1)
    steps = build_steps(cfg, hand_model)

    raw = _fake_batch(np.random.RandomState(0), 4)

    def run(devices):
        mesh = data_mesh(devices)
        state = jax.device_put(
            steps.init_state(jax.random.key(0)), replicated(mesh)
        )
        batch = _put(raw, mesh)
        step = jax.jit(steps.combined_step)
        state, metrics, _ = step(
            state, jax.random.key(7), jnp.asarray(1e-3), batch, jnp.asarray(True)
        )
        return float(metrics["loss"]), state

    loss1, state1 = run(jax.devices()[:1])
    loss4, state4 = run(jax.devices()[:4])
    np.testing.assert_allclose(loss1, loss4, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(state1.params), jax.tree.leaves(state4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_shard_batch_places_on_mesh():
    mesh = data_mesh(jax.devices()[:2])
    tree = {"x": np.zeros((4, 3)), "y": np.ones((8,))}
    out = shard_batch(mesh, tree)
    assert out["x"].sharding == NamedSharding(mesh, P("data"))
