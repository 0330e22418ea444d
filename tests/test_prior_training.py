"""Offline prior trainers: VAE/denoiser smoke training + PCA builder."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def hand():
    from spherehand_tpu.hand.assets import load_hand_model

    return load_hand_model()


@pytest.mark.slow
def test_train_pose_vae_smoke(hand):
    from spherehand_tpu.models.pose_vae import PoseVae
    from spherehand_tpu.train.priors import train_pose_vae

    params = train_pose_vae(hand, steps=3, batch=16, log_every=10)
    recon, mu, logvar, like = PoseVae().apply(
        {"params": params}, jnp.zeros((2, 123))
    )
    assert recon.shape == (2, 123)
    assert np.isfinite(float(like))


@pytest.mark.slow
def test_train_pose_denoiser_smoke(hand):
    from spherehand_tpu.models.pose_denoiser import PoseDenoiser
    from spherehand_tpu.train.priors import train_pose_denoiser

    params = train_pose_denoiser(hand, steps=3, batch=16, log_every=10)
    out = PoseDenoiser().apply(
        {"params": params}, jnp.zeros((2, 41, 3))
    )
    assert out.shape == (2, 41, 3)


def test_build_pca_prior_small(hand):
    from spherehand_tpu.hand.skeleton import skeleton_fk
    from spherehand_tpu.data.sampler import sample_poses
    from spherehand_tpu.losses.pca_prior import pca_prior_loss
    from spherehand_tpu.train.priors import build_pca_prior

    mean, comps = build_pca_prior(
        hand, num_samples=2048, num_components=16, batch=512
    )
    assert mean.shape == (123,) and comps.shape == (16, 123)
    # components are orthonormal
    np.testing.assert_allclose(comps @ comps.T, np.eye(16), atol=1e-3)
    # plausible skeletons score much lower than random point clouds
    joints = skeleton_fk(hand, sample_poses(jax.random.key(9), 64))
    plausible = float(pca_prior_loss(jnp.asarray(mean), jnp.asarray(comps), joints))
    rand = jnp.asarray(
        np.random.RandomState(0).uniform(-80, 80, (64, 41, 3)).astype(np.float32)
    )
    implausible = float(pca_prior_loss(jnp.asarray(mean), jnp.asarray(comps), rand))
    assert plausible < implausible


def test_save_flax_params_roundtrip(tmp_path):
    from spherehand_tpu.train.priors import save_flax_params_npz

    params = {"a": {"b": np.ones((2, 2)), "c": np.zeros(3)}, "d": np.arange(4)}
    path = str(tmp_path / "p.npz")
    save_flax_params_npz(path, params)
    raw = np.load(path)
    assert set(raw.files) == {"a/b", "a/c", "d"}
