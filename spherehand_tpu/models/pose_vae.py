"""Pose VAE prior (flax) — the learned pose-plausibility loss.

Re-design of the reference's ``network/pose_vae.py`` (PoseVae :11-99): a
123-d (41 joints x 3, scaled by 1/100) autoencoding VAE with GroupNorm MLP
encoder/decoder and 32-d latent. Frozen released weights load from
``assets/pose_vae.npz`` (converted from mesh/model/pose_vae.pth).

The prior loss is reconstruction MSE (mean) + KL divergence (sum), with the
reparameterization std scaled by 0.1 (reference pose_vae.py:49-62,81-89).
RNG is threaded explicitly — the torch version draws implicitly.
"""
from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from spherehand_tpu.hand.assets import DEFAULT_ASSET_DIR


class MlpBlock(nn.Module):
    """Linear -> GroupNorm(16) -> ReLU, matching the torch Sequential units."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.features, name="dense")(x)
        x = nn.GroupNorm(num_groups=16, epsilon=1e-5, name="gn")(x)
        return nn.relu(x)


class PoseVae(nn.Module):
    pose_features: int = 123
    latent_features: int = 32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        rng: jax.Array | None = None,
        reparameterize: bool = False,
    ):
        """x (B, pose_features) -> (recon, mu, logvar, likelihood)."""
        h = MlpBlock(256, name="enc0")(x)
        h = MlpBlock(256, name="enc1")(h)
        mu = nn.Dense(self.latent_features, name="mu")(h)
        logvar = nn.Dense(self.latent_features, name="logvar")(h)
        if reparameterize:
            std = jnp.exp(0.5 * logvar) * 0.1
            # Per-row keys: row i's draw is independent of the batch size, so
            # padded data-parallel batches reproduce the unpadded rows' noise
            # exactly (a batch-shaped normal(rng, (B, L)) would not).
            row_keys = jax.vmap(jax.random.fold_in, (None, 0))(
                rng, jnp.arange(std.shape[0])
            )
            noise = jax.vmap(
                lambda k: jax.random.normal(k, std.shape[1:], std.dtype)
            )(row_keys)
            z = mu + noise * std
        else:
            z = mu
        d = MlpBlock(256, name="dec0")(z)
        d = MlpBlock(256, name="dec1")(d)
        recon = nn.Dense(self.pose_features, name="dec_out")(d)
        likelihood = self.likelihood(x, recon, mu, logvar)
        return recon, mu, logvar, likelihood

    @staticmethod
    def likelihood(x, recon, mu, logvar) -> jnp.ndarray:
        """Recon MSE (mean) + KLD (sum) (reference pose_vae.py:55-62)."""
        recon_loss = jnp.mean((x - recon) ** 2)
        kld = -0.5 * jnp.sum(1.0 + logvar - mu * mu - jnp.exp(logvar))
        return recon_loss + kld

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        d = MlpBlock(256, name="dec0")(z)
        d = MlpBlock(256, name="dec1")(d)
        return nn.Dense(self.pose_features, name="dec_out")(d)


def prior_loss(
    params,
    joints: jnp.ndarray,
    rng: jax.Array,
    pose_features: int = 123,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """VAE prior loss on (possibly multi-view) joints already divided by 100.

    joints: (..., 41, 3) or (..., 123); flattened to (N, 123). Always uses the
    reparameterized sample (reference pose_vae.py:81-89). ``weights`` (N,)
    marks padded flattened rows with 0 (see :mod:`spherehand_tpu.ops.reduce`).
    """
    from spherehand_tpu.ops.reduce import bmean, bsum

    x = joints.reshape(-1, pose_features)
    recon, mu, logvar, likelihood = PoseVae(pose_features).apply(
        {"params": params}, x, rng=rng, reparameterize=True
    )
    if weights is None:
        return likelihood
    recon_loss = bmean((x - recon) ** 2, weights)
    kld = -0.5 * bsum(1.0 + logvar - mu * mu - jnp.exp(logvar), weights)
    return recon_loss + kld


def _dense(state: dict, key: str) -> dict:
    return {
        "kernel": np.asarray(state[f"{key}/weight"]).T,
        "bias": np.asarray(state[f"{key}/bias"]),
    }


def _gn(state: dict, key: str) -> dict:
    return {
        "scale": np.asarray(state[f"{key}/weight"]),
        "bias": np.asarray(state[f"{key}/bias"]),
    }


def convert_torch_state(state: dict) -> dict:
    """Torch PoseVae state_dict ('/'-joined keys) -> flax params."""
    return {
        "enc0": {"dense": _dense(state, "base/0"), "gn": _gn(state, "base/1")},
        "enc1": {"dense": _dense(state, "base/3"), "gn": _gn(state, "base/4")},
        "mu": _dense(state, "mu"),
        "logvar": _dense(state, "logvar"),
        "dec0": {"dense": _dense(state, "decoder/0"), "gn": _gn(state, "decoder/1")},
        "dec1": {"dense": _dense(state, "decoder/3"), "gn": _gn(state, "decoder/4")},
        "dec_out": _dense(state, "decoder/6"),
    }


def load_pose_vae_params(path: str | None = None) -> dict:
    """Released frozen VAE weights (assets/pose_vae.npz) as flax params."""
    if path is None:
        path = os.path.join(DEFAULT_ASSET_DIR, "pose_vae.npz")
    raw = np.load(path)
    return convert_torch_state({k: raw[k] for k in raw.files})
