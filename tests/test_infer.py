"""Inference API smoke tests."""
import numpy as np

import jax
import jax.numpy as jnp

from spherehand_tpu.infer import PoseEstimator
from spherehand_tpu.models.estimator import make_network


def _random_params(num_stacks=1):
    net = make_network(num_stacks)
    return net.init(jax.random.key(0), jnp.zeros((1, 64, 64)))["params"]


def test_predict_shapes_and_denoise():
    est = PoseEstimator(_random_params(), num_stacks=1, denoise=True)
    dms = np.full((3, 64, 64), 100.0, np.float32)
    dms[:, 20:40, 20:40] = 40.0
    joints = est.predict(dms)
    assert joints.shape == (3, 41, 3)
    assert np.isfinite(joints).all()
    joints_adj = est.predict(dms, palm_adjust=True)
    assert joints_adj.shape == (3, 41, 3)
    # fingers untouched by palm adjustment
    np.testing.assert_allclose(joints_adj[:, 11:], joints[:, 11:], atol=1e-5)


def test_predict_with_heatmaps():
    est = PoseEstimator(_random_params(), num_stacks=1, denoise=False)
    dms = np.full((2, 64, 64), 100.0, np.float32)
    joints, hms = est.predict_with_heatmaps(dms)
    assert joints.shape == (2, 41, 3)
    assert hms.shape == (2, 41, 16, 16)


def test_load_estimator_from_checkpoint(tmp_path):
    import os

    import orbax.checkpoint as ocp

    from spherehand_tpu.hand.assets import load_hand_model
    from spherehand_tpu.infer import load_estimator
    from spherehand_tpu.train.config import EngineConfig
    from spherehand_tpu.train.steps import build_steps

    steps = build_steps(EngineConfig(num_stacks=1), load_hand_model())
    state = steps.init_state(jax.random.key(3))
    path = os.path.abspath(str(tmp_path / "ckpt"))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state)
    est = load_estimator(path, num_stacks=1, denoise=False)
    dms = np.full((1, 64, 64), 100.0, np.float32)
    joints = est.predict(dms)
    assert joints.shape == (1, 41, 3)


def test_pretrained_synthetic_artifact():
    """The shipped synthetic-pretrained params predict sensible joints."""
    import os

    from spherehand_tpu.infer import load_params_npz

    path = os.path.join(
        os.path.dirname(__file__), "..", "assets", "pretrained",
        "synthetic_params.npz",
    )
    if not os.path.exists(path):
        import pytest

        pytest.skip("pretrained artifact not present")
    params = load_params_npz(path)
    est = PoseEstimator(params, num_stacks=1, denoise=False)
    # render a real posed hand and check the estimate is in-range
    from spherehand_tpu.data.sampler import sample_poses
    from spherehand_tpu.data.synthesizer import synthesize
    from spherehand_tpu.hand.assets import load_hand_model

    hand = load_hand_model()
    poses = sample_poses(jax.random.key(123456), 4)
    synt = synthesize(hand, jax.random.key(2), poses, add_noise=False)
    joints = est.predict(np.asarray(synt.dms) * 100.0)
    err = np.linalg.norm(joints - np.asarray(synt.xyz), axis=-1).mean()
    assert err < 25.0, f"pretrained artifact error {err:.1f} mm"


def test_chunked_serving_matches_monolithic():
    """Large batches scan over serve_chunk-sized chunks inside the jit
    (XLA layout pathology at large B, PERF.md round 4); chunking and the
    ragged-tail padding must not change per-sample results."""
    import numpy as np

    from spherehand_tpu.infer import PoseEstimator, load_params_npz

    params = load_params_npz("assets/pretrained/synthetic_params.npz")
    rng = np.random.RandomState(3)
    dms = np.full((5, 64, 64), 100.0, np.float32)
    dms[:, 20:44, 20:44] = rng.uniform(20, 60, (5, 24, 24))

    mono = PoseEstimator(params, denoise=True, serve_chunk=8).predict(dms)
    chunked = PoseEstimator(params, denoise=True, serve_chunk=2).predict(dms)
    np.testing.assert_allclose(chunked, mono, atol=1e-4)


def test_mesh_serving_matches_single_device():
    """Data-parallel serving (PoseEstimator(mesh=...)) must be a pure
    batch-split: per-sample outputs identical to the single-device
    predictor, including the host-side padding for batches not divisible
    by the device count and the per-device chunk scan.

    Tolerance: the local conv batch shape differs between the two paths
    (e.g. 3 rows -> 1/device vs chunks of 2), and XLA's conv reduction
    order is shape-dependent, so even CPU f32 carries um-scale
    reassociation noise — the same effect class as the documented TPU
    bf16 wobble, two orders below the 0.5 mm parity bar. atol=2e-3 mm."""
    import numpy as np

    from spherehand_tpu.infer import PoseEstimator, load_params_npz
    from spherehand_tpu.parallel.mesh import data_mesh

    params = load_params_npz("assets/pretrained/synthetic_params.npz")
    mesh = data_mesh()
    n_dev = mesh.devices.size
    assert n_dev > 1, "conftest should simulate an 8-device CPU mesh"
    rng = np.random.RandomState(11)

    single = PoseEstimator(params, denoise=True, serve_chunk=2)
    sharded = PoseEstimator(params, denoise=True, serve_chunk=2, mesh=mesh)

    # Non-divisible batch (padding) + per-device chunking (3 local rows
    # pad to 2 chunks of 2), and a batch smaller than the mesh.
    for b in (n_dev * 3 - 4, 3):
        dms = np.full((b, 64, 64), 100.0, np.float32)
        dms[:, 20:44, 20:44] = rng.uniform(20, 60, (b, 24, 24))
        np.testing.assert_allclose(
            sharded.predict(dms), single.predict(dms), atol=2e-3
        )
        jm, hm = sharded.predict_with_heatmaps(dms)
        js, hs = single.predict_with_heatmaps(dms)
        assert jm.shape == (b, 41, 3) and hm.shape == hs.shape
        np.testing.assert_allclose(hm, hs, atol=2e-3)


def test_precision_highest_mode():
    """precision="highest" (the parity-grade f32-pass mode) must be a pure
    numerics switch: same param tree, and on CPU — where f32 convs are
    already exact — identical outputs to the default path. On TPU the
    default path runs bf16 conv passes, so "highest" removes the documented
    ~5 mm batch-composition wobble (infer.py; measured artifact
    tests/goldens/precision_wobble.json)."""
    import numpy as np

    from spherehand_tpu.infer import PoseEstimator, load_params_npz

    params = load_params_npz("assets/pretrained/synthetic_params.npz")
    rng = np.random.RandomState(7)
    dms = np.full((4, 64, 64), 100.0, np.float32)
    dms[:, 20:44, 20:44] = rng.uniform(20, 60, (4, 24, 24))

    default = PoseEstimator(params, denoise=True).predict(dms)
    highest = PoseEstimator(params, denoise=True, precision="highest").predict(dms)
    assert highest.shape == (4, 41, 3)
    np.testing.assert_allclose(highest, default, atol=1e-4)


def test_eval_precision_config_plumbs_through():
    """cfg.eval_precision="highest" swaps only the eval network; the step
    still runs on the same params (CPU: identical metrics)."""
    import jax.numpy as jnp

    from spherehand_tpu.hand.assets import load_hand_model
    from spherehand_tpu.train.config import EngineConfig
    from spherehand_tpu.train.steps import RealBatch, build_steps

    hand = load_hand_model()
    rng = np.random.RandomState(1)
    dms = np.full((2, 3, 64, 64), 100.0, np.float32)
    dms[:, :, 24:40, 24:40] = 45.0
    batch = RealBatch(
        dms=jnp.asarray(dms),
        gt_joints=jnp.asarray(rng.uniform(-80, 80, (2, 3, 36, 3)).astype(np.float32)),
        poses=jnp.tile(jnp.eye(4), (2, 3, 1, 1)).astype(jnp.float32),
        inv_poses=jnp.tile(jnp.eye(4), (2, 3, 1, 1)).astype(jnp.float32),
    )
    steps_d = build_steps(EngineConfig(num_stacks=1), hand)
    steps_h = build_steps(
        EngineConfig(num_stacks=1, eval_precision="highest"), hand
    )
    params = steps_d.init_state(jax.random.key(5)).params
    m_d, est_d = steps_d.eval_step(params, jax.random.key(0), batch)
    m_h, est_h = steps_h.eval_step(params, jax.random.key(0), batch)
    np.testing.assert_allclose(np.asarray(est_h), np.asarray(est_d), atol=1e-4)
    assert np.isclose(
        float(m_h["avg_joint_error"]), float(m_d["avg_joint_error"]), atol=1e-4
    )
