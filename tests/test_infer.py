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
