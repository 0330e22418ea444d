"""Data-parallel sharding: sharded and single-device steps agree."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from spherehand_tpu.parallel import batch_sharding, data_mesh, replicated, shard_batch
from spherehand_tpu.train.config import EngineConfig
from spherehand_tpu.train.steps import RealBatch, build_steps


@pytest.mark.slow
def test_sharded_step_matches_single_device(hand_model_fixture=None):
    from spherehand_tpu.hand.assets import load_hand_model

    hand = load_hand_model()
    cfg = EngineConfig(synt_batch=8, real_batch=4, num_stacks=1)
    steps = build_steps(cfg, hand)

    rng = np.random.RandomState(0)
    dms = np.full((4, 3, 64, 64), 100.0, np.float32)
    dms[:, :, 24:40, 24:40] = rng.uniform(20, 60, (4, 3, 16, 16))
    batch_np = dict(
        dms=dms,
        gt_joints=rng.uniform(-80, 80, (4, 3, 36, 3)).astype(np.float32),
        poses=np.tile(np.eye(4, dtype=np.float32), (4, 3, 1, 1)),
        inv_poses=np.tile(np.eye(4, dtype=np.float32), (4, 3, 1, 1)),
    )

    def run(devices):
        mesh = data_mesh(devices)
        repl = replicated(mesh)
        state = jax.device_put(steps.init_state(jax.random.key(0)), repl)
        batch = RealBatch(**{
            k: jax.device_put(v, batch_sharding(mesh)) for k, v in batch_np.items()
        })
        step = jax.jit(steps.combined_step)
        state, metrics, _ = step(
            state, jax.random.key(7), jnp.asarray(1e-3), batch, jnp.asarray(True)
        )
        return float(metrics["loss"]), state

    loss1, state1 = run(jax.devices()[:1])
    loss4, state4 = run(jax.devices()[:4])
    # same program semantics: losses agree to float tolerance
    np.testing.assert_allclose(loss1, loss4, rtol=1e-4)
    # Gradient psum reduction order differs across shardings; Adam's
    # rsqrt(v) amplifies that float noise on near-zero-gradient weights.
    leaves1 = jax.tree.leaves(state1.params)
    leaves4 = jax.tree.leaves(state4.params)
    for a, b in zip(leaves1, leaves4):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_shard_batch_places_on_mesh():
    mesh = data_mesh(jax.devices()[:2])
    tree = {"x": np.zeros((4, 3)), "y": np.ones((8,))}
    out = shard_batch(mesh, tree)
    assert out["x"].sharding == NamedSharding(mesh, P("data"))
