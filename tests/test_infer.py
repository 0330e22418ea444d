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
