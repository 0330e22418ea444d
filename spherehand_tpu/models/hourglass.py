"""Stacked hourglass heatmap CNN in flax/linen, NHWC for TPU.

Re-design of the reference's ``network/hourglass.py`` (Bottleneck :7-41,
Hourglass :44-85, HourglassNet :88-176). Functionally identical graph:
pre-activation GroupNorm bottlenecks (expansion 2), a recursive depth-2
U-shape with maxpool down / bilinear x2 up, N stacks with intermediate
supervision re-injection, and 2*41-channel score maps per stack. Differences
from the reference are layout and idiom only: NHWC tensors (TPU conv layout),
bfloat16-friendly compute via flax defaults, and explicit module names chosen
so torch checkpoints map 1:1 (see :func:`convert_torch_state`).

Stem: 5x5 stride-2 conv (1->64) -> GN(4) -> three bottlenecks with a maxpool
after the first, leaving (B, 16, 16, 256) features for the stacks
(reference hourglass.py:95-102,147-160; 64px input -> 16px).
"""
from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch Conv2d's default kaiming_uniform(a=sqrt(5)) is variance_scaling with
# gain^2 = 2/(1+5) = 1/3 over fan_in, uniform. Matching it keeps training
# dynamics comparable to the reference (bias stays zero-init; torch's tiny
# uniform bias init is immaterial).
torch_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class TorchConv(nn.Conv):
    kernel_init: nn.initializers.Initializer = torch_conv_init


class Bottleneck(nn.Module):
    """Pre-activation GroupNorm bottleneck, expansion 2 (hourglass.py:7-41).

    ``dtype`` sets the conv compute dtype (bfloat16 drives the MXU at full
    rate); GroupNorm statistics stay float32 for stability. ``precision``
    sets the conv pass precision: TPU default for f32 convs is bf16 passes
    (fast, but per-sample outputs become batch-composition dependent up to
    ~5 mm on ambiguous samples — infer.py); ``"highest"`` forces true-f32
    passes for parity-grade eval.
    """

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.precision
        y = nn.GroupNorm(num_groups=16, epsilon=1e-5, name="gn1")(x)
        y = nn.relu(y)
        y = TorchConv(
            self.planes, (1, 1), dtype=self.dtype, precision=p, name="conv1"
        )(y)
        y = nn.GroupNorm(num_groups=16, epsilon=1e-5, name="gn2")(y)
        y = nn.relu(y)
        y = TorchConv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=1, dtype=self.dtype, precision=p, name="conv2",
        )(y)
        y = nn.GroupNorm(num_groups=16, epsilon=1e-5, name="gn3")(y)
        y = nn.relu(y)
        y = TorchConv(
            self.planes * 2, (1, 1), dtype=self.dtype, precision=p, name="conv3"
        )(y)
        residual = x.astype(y.dtype)
        if self.downsample:
            residual = TorchConv(
                self.planes * 2, (1, 1), strides=(self.stride, self.stride),
                dtype=self.dtype, precision=p, name="down",
            )(x)
        return y + residual


def _max_pool2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _upsample2_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear x2, half-pixel centers (== torch align_corners=False)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


class Hourglass(nn.Module):
    """Recursive U-module; returns (out, innermost latent) (hourglass.py:44-85)."""

    planes: int = 128
    depth: int = 2
    dtype: jnp.dtype = jnp.float32
    precision: Any = None

    def setup(self):
        blocks = {}
        for i in range(self.depth):
            n_res = 4 if i == 0 else 3
            for j in range(n_res):
                blocks[f"b{i}_{j}"] = Bottleneck(
                    self.planes, dtype=self.dtype, precision=self.precision,
                    name=f"b{i}_{j}",
                )
        self.blocks = blocks

    def __call__(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        return self._recurse(self.depth, x)

    def _recurse(self, n: int, x: jnp.ndarray):
        up1 = self.blocks[f"b{n - 1}_0"](x)
        low1 = self.blocks[f"b{n - 1}_1"](_max_pool2(x))
        if n > 1:
            low2, latent = self._recurse(n - 1, low1)
        else:
            low2 = self.blocks["b0_3"](low1)
            latent = low2
        low3 = self.blocks[f"b{n - 1}_2"](low2)
        return up1 + _upsample2_bilinear(low3), latent


class HourglassNet(nn.Module):
    """N-stack hourglass emitting (B, 16, 16, num_outputs) scores per stack.

    Returns (scores, latents): lists of per-stack score maps and innermost
    hourglass features (reference hourglass.py:147-173). NHWC throughout;
    callers slice channels [0:41] = uv heatmaps, [41:82] = depth heatmaps.
    """

    num_stacks: int = 2
    num_outputs: int = 82
    feats: int = 128
    dtype: jnp.dtype = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> tuple[list[jnp.ndarray], list[jnp.ndarray]]:
        if x.ndim == 3:
            x = x[..., None]  # (B, H, W) depth map -> single channel
        ch = self.feats * 2
        dt = self.dtype
        p = self.precision
        x = TorchConv(
            64, (5, 5), strides=(2, 2), padding=2, dtype=dt, precision=p,
            name="conv1",
        )(x)
        x = nn.GroupNorm(num_groups=4, epsilon=1e-5, name="gn1")(x)
        x = nn.relu(x)
        x = Bottleneck(64, downsample=True, dtype=dt, precision=p, name="layer1")(x)
        x = _max_pool2(x)
        x = Bottleneck(128, downsample=True, dtype=dt, precision=p, name="layer2")(x)
        x = Bottleneck(self.feats, dtype=dt, precision=p, name="layer3")(x)

        scores, latents = [], []
        for i in range(self.num_stacks):
            y, latent = Hourglass(self.feats, dtype=dt, precision=p, name=f"hg{i}")(x)
            y = Bottleneck(self.feats, dtype=dt, precision=p, name=f"res{i}")(y)
            y = TorchConv(ch, (1, 1), dtype=dt, precision=p, name=f"fc_conv{i}")(y)
            y = nn.GroupNorm(num_groups=16, epsilon=1e-5, name=f"fc_gn{i}")(y)
            y = nn.relu(y)
            score = TorchConv(
                self.num_outputs, (1, 1), dtype=dt, precision=p, name=f"score{i}"
            )(y)
            # heads and everything downstream (soft-argmax, losses) run at
            # >= f32: upcast bf16 activations, keep f64 (A/B oracle) intact
            head_dt = jnp.result_type(score.dtype, jnp.float32)
            scores.append(score.astype(head_dt))
            latents.append(latent.astype(head_dt))
            if i < self.num_stacks - 1:
                fc_ = TorchConv(
                    ch, (1, 1), dtype=dt, precision=p, name=f"inter_fc{i}"
                )(y)
                score_ = TorchConv(
                    ch, (1, 1), dtype=dt, precision=p, name=f"inter_score{i}"
                )(score)
                x = x + fc_ + score_
        return scores, latents


def _bottleneck_params(get, prefix: str, downsample: bool) -> dict:
    out = {
        "gn1": {"scale": get(f"{prefix}/bn1/weight"), "bias": get(f"{prefix}/bn1/bias")},
        "conv1": {
            "kernel": get(f"{prefix}/conv1/weight").transpose(2, 3, 1, 0),
            "bias": get(f"{prefix}/conv1/bias"),
        },
        "gn2": {"scale": get(f"{prefix}/bn2/weight"), "bias": get(f"{prefix}/bn2/bias")},
        "conv2": {
            "kernel": get(f"{prefix}/conv2/weight").transpose(2, 3, 1, 0),
            "bias": get(f"{prefix}/conv2/bias"),
        },
        "gn3": {"scale": get(f"{prefix}/bn3/weight"), "bias": get(f"{prefix}/bn3/bias")},
        "conv3": {
            "kernel": get(f"{prefix}/conv3/weight").transpose(2, 3, 1, 0),
            "bias": get(f"{prefix}/conv3/bias"),
        },
    }
    if downsample:
        out["down"] = {
            "kernel": get(f"{prefix}/downsample/0/weight").transpose(2, 3, 1, 0),
            "bias": get(f"{prefix}/downsample/0/bias"),
        }
    return out


def _conv_params(get, prefix: str) -> dict:
    return {
        "kernel": get(f"{prefix}/weight").transpose(2, 3, 1, 0),
        "bias": get(f"{prefix}/bias"),
    }


def convert_torch_state(
    state: dict[str, np.ndarray], num_stacks: int
) -> dict[str, Any]:
    """Torch HourglassNet state_dict (keys with '/' separators) -> flax params.

    Conv kernels transpose OIHW -> HWIO; GroupNorm weight/bias -> scale/bias.
    Used both for golden-parity tests and for importing released ``.pth``
    checkpoints (reference README.md:35-42).
    """

    def get(key: str) -> np.ndarray:
        return np.asarray(state[key])

    params: dict[str, Any] = {
        "conv1": _conv_params(get, "conv1"),
        "gn1": {"scale": get("bn1/weight"), "bias": get("bn1/bias")},
        "layer1": _bottleneck_params(get, "layer1/0", True),
        "layer2": _bottleneck_params(get, "layer2/0", True),
        "layer3": _bottleneck_params(get, "layer3/0", False),
    }
    for s in range(num_stacks):
        hg_blocks = {}
        for i in range(2):
            n_res = 4 if i == 0 else 3
            for j in range(n_res):
                hg_blocks[f"b{i}_{j}"] = _bottleneck_params(
                    get, f"hg/{s}/hg/{i}/{j}/0", False
                )
        params[f"hg{s}"] = hg_blocks
        params[f"res{s}"] = _bottleneck_params(get, f"res/{s}/0", False)
        params[f"fc_conv{s}"] = _conv_params(get, f"fc/{s}/0")
        params[f"fc_gn{s}"] = {
            "scale": get(f"fc/{s}/1/weight"),
            "bias": get(f"fc/{s}/1/bias"),
        }
        params[f"score{s}"] = _conv_params(get, f"score/{s}")
        if s < num_stacks - 1:
            params[f"inter_fc{s}"] = _conv_params(get, f"fc_/{s}")
            params[f"inter_score{s}"] = _conv_params(get, f"score_/{s}")
    return params
