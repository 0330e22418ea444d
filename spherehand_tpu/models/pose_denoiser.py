"""Palm-pose denoiser MLP (flax) — eval-time post-processing.

Re-design of the reference's ``network/pose_denoiser.py`` (PoseDenoiser
:21-81): a GroupNorm MLP that reads the 30 finger joints in 3D plus the 11
palm joints in 2D (112 inputs, x0.01 scaling) and rewrites the 11 palm
joints' 3D positions (33 outputs, /0.01). Applied to the final-stack joint
estimate of view 0 at eval (reference engine.py:203-205). Frozen released
weights load from ``assets/pose_denoiser.npz``.
"""
from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from spherehand_tpu.hand.assets import DEFAULT_ASSET_DIR
from spherehand_tpu.models.pose_vae import MlpBlock, _dense, _gn

# Input/output index tables (reference pose_denoiser.py:12-19): features are
# the flattened (41, 3) joint vector.
_FINGER = np.arange(11, 41)
_PALM = np.arange(11)
INPUT_INDICES = np.concatenate(
    [_FINGER * 3, _FINGER * 3 + 1, _FINGER * 3 + 2, _PALM * 3, _PALM * 3 + 1]
).astype(np.int32)
OUTPUT_INDICES = np.stack([_PALM * 3, _PALM * 3 + 1, _PALM * 3 + 2], axis=1).reshape(
    -1
).astype(np.int32)


class PoseDenoiser(nn.Module):
    """Index tables are module fields: the released checkpoint was trained
    with an older input layout than the current reference source defaults
    (contiguous finger xyz, then palm-x block, then palm-y block), and the
    torch module restores them from saved buffers — so must we."""

    scale_factor: float = 0.01
    input_indices: tuple = tuple(int(i) for i in INPUT_INDICES)
    output_indices: tuple = tuple(int(i) for i in OUTPUT_INDICES)

    @nn.compact
    def __call__(
        self,
        joints: jnp.ndarray,
        rng: jax.Array | None = None,
        train: bool = False,
    ) -> jnp.ndarray:
        """joints (..., 41, 3) or (..., 123) in mm -> same shape, palm replaced."""
        shape = joints.shape
        flat = joints.reshape(-1, 123)
        x = flat[:, np.asarray(self.input_indices)] * self.scale_factor
        if train:
            x = x + jax.random.normal(rng, x.shape, x.dtype) * 0.1
        h = MlpBlock(256, name="l0")(x)
        h = MlpBlock(256, name="l1")(h)
        out = nn.Dense(len(self.output_indices), name="out")(h) / self.scale_factor
        denoised = flat.at[:, np.asarray(self.output_indices)].set(out)
        return denoised.reshape(shape)


def denoiser_loss(gt: jnp.ndarray, est: jnp.ndarray) -> jnp.ndarray:
    """MSE restricted to the palm outputs (reference pose_denoiser.py:75-81)."""
    gt = gt.reshape(-1, 123)[:, OUTPUT_INDICES]
    est = est.reshape(-1, 123)[:, OUTPUT_INDICES]
    return jnp.mean((gt - est) ** 2)


def convert_torch_state(state: dict) -> dict:
    """Torch PoseDenoiser state_dict ('/'-joined keys) -> flax params."""
    return {
        "l0": {"dense": _dense(state, "network/0"), "gn": _gn(state, "network/1")},
        "l1": {"dense": _dense(state, "network/3"), "gn": _gn(state, "network/4")},
        "out": _dense(state, "network/6"),
    }


def load_pose_denoiser(path: str | None = None) -> tuple[PoseDenoiser, dict]:
    """Released frozen denoiser (assets/pose_denoiser.npz) -> (module, params).

    The module is built with the checkpoint's own index buffers (reference
    pose_denoiser.py:34-35 registers them; load_state_dict restores them).
    """
    if path is None:
        path = os.path.join(DEFAULT_ASSET_DIR, "pose_denoiser.npz")
    raw = np.load(path)
    params = convert_torch_state({k: raw[k] for k in raw.files if "/" in k})
    kwargs = {}
    if "input_indices" in raw.files:
        kwargs["input_indices"] = tuple(int(i) for i in raw["input_indices"])
    if "output_indices" in raw.files:
        kwargs["output_indices"] = tuple(int(i) for i in raw["output_indices"])
    return PoseDenoiser(**kwargs), params
