"""PoseVae / PoseDenoiser parity against released-weight goldens."""
import numpy as np

import jax.numpy as jnp

from spherehand_tpu.models.pose_denoiser import load_pose_denoiser
from spherehand_tpu.models.pose_vae import PoseVae, load_pose_vae_params


def test_pose_vae_matches_golden(goldens):
    g = goldens("pose_vae")
    params = load_pose_vae_params()
    recon, mu, logvar, likelihood = PoseVae().apply(
        {"params": params}, jnp.asarray(g["x"])
    )
    np.testing.assert_allclose(np.asarray(mu), g["mu"], atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(logvar), g["logvar"], atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(recon), g["recon"], atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        float(likelihood), float(g["likelihood"]), rtol=1e-4
    )


def test_pose_denoiser_matches_golden(goldens):
    g = goldens("pose_denoiser")
    denoiser, params = load_pose_denoiser()
    out = denoiser.apply({"params": params}, jnp.asarray(g["joints"]))
    np.testing.assert_allclose(np.asarray(out), g["denoised"], atol=2e-3, rtol=1e-4)
    # finger joints pass through untouched
    np.testing.assert_array_equal(
        np.asarray(out)[:, 11:], g["joints"][:, 11:]
    )
