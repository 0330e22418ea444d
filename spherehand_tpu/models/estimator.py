"""Pose estimator: hourglass forward + soft-argmax, real/synthetic branches.

Re-design of the reference's ``HeatmapEstimationNetwork``
(network/create_network_and_criterion.py:27-144) as pure functions over flax
params. The reference concatenates the synthetic batch and the flattened
real multi-view batch into one hourglass forward (:107-108); we do the same —
one big NHWC conv batch is exactly what the MXU wants. Train-time resize-crop
augmentation on the real branch (:42-49, scale 0.75-0.95, 50% prob) runs
inside jit via the gather-based :func:`spherehand_tpu.data.noise.resize_crop`,
and the recovered x/y coordinates are un-scaled by the augmentation factors
(:59-61,124-126).

Outputs use (B, J, H, W) heatmap layout to match the loss stack and the
reference's result dict keys.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from spherehand_tpu.constants import Constants
from spherehand_tpu.data.noise import resize_crop, sample_resize_scales
from spherehand_tpu.models.hourglass import HourglassNet
from spherehand_tpu.ops.softargmax import recover_xyz

_C = Constants()


class EstimatorOutput(NamedTuple):
    """Per-stack network outputs; synt_* lead the batch, real_* are (B, V, ...)."""

    synt_uv_hms: tuple  # each (Bs, J, H, W)
    synt_d_hms: tuple
    synt_xyz: tuple     # each (Bs, J, 3)
    real_uv_hms: tuple  # each (Br, V, J, H, W)
    real_d_hms: tuple
    real_xyz: tuple     # each (Br, V, J, 3)
    real_resized_dms: jnp.ndarray | None  # (Br*V, H, W) post-aug inputs
    synt_latent: tuple  # each (Bs, h, w, C) domain features
    real_latent: tuple  # each (Br*V, h, w, C)


def make_network(num_stacks: int, dtype=None, precision=None) -> HourglassNet:
    """dtype: conv compute dtype; jnp.bfloat16 drives the MXU at full rate
    while heads, soft-argmax, and the loss stack stay float32.

    precision: conv pass precision. TPU's default for f32 convs is bf16
    passes — fast, but per-sample outputs depend on batch composition by up
    to ~5 mm on ambiguous samples (infer.py). ``"highest"`` forces true-f32
    passes: parity-grade determinism for eval at +11% measured device cost
    at B=128 (the pipeline is not conv-bound there; +45% at a monolithic
    B=1024 — tests/goldens/precision_wobble.json).
    """
    import jax.numpy as jnp

    return HourglassNet(
        num_stacks=num_stacks,
        num_outputs=2 * _C.num_joints,
        dtype=dtype or jnp.float32,
        precision=precision,
    )


def _split_scores(score_nhwc: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(B, H, W, 2J) -> uv (B, J, H, W), d (B, J, H, W)."""
    s = score_nhwc.transpose(0, 3, 1, 2)
    return s[:, : _C.num_joints], s[:, _C.num_joints :]


def forward(
    network: HourglassNet,
    params: Any,
    synt_dms: jnp.ndarray | None = None,
    real_dms: jnp.ndarray | None = None,
    rng: jax.Array | None = None,
    train: bool = False,
    real_aug: bool = True,
) -> EstimatorOutput:
    """Run the estimator on a synthetic batch, a real batch, or both.

    synt_dms: (Bs, 64, 64) scaled depth; real_dms: (Br, V, 64, 64) scaled.
    Matches HeatmapEstimationNetwork.forward: both domains share one hourglass
    forward; the real branch optionally sees resize-crop augmentation whose
    scale factors divide back out of the recovered x/y.
    """
    num_synt = 0 if synt_dms is None else synt_dms.shape[0]
    parts = []
    if synt_dms is not None:
        parts.append(synt_dms)
    u_scales = v_scales = None
    num_real = num_view = 0
    if real_dms is not None:
        num_real, num_view = real_dms.shape[0], real_dms.shape[1]
        flat_real = real_dms.reshape(-1, real_dms.shape[2], real_dms.shape[3])
        if train and real_aug:
            u_scales, v_scales = sample_resize_scales(rng, num_real * num_view)
            flat_real = resize_crop(flat_real, u_scales, v_scales)
        parts.append(flat_real)

    combined = jnp.concatenate(parts, axis=0)
    scores, latents = network.apply({"params": params}, combined)

    synt_uv, synt_d, synt_xyz = [], [], []
    real_uv, real_d, real_xyz = [], [], []
    for score in scores:
        uv, d = _split_scores(score)
        if num_synt:
            s_uv, s_d = uv[:num_synt], d[:num_synt]
            synt_uv.append(s_uv)
            synt_d.append(s_d)
            synt_xyz.append(recover_xyz(s_uv, s_d))
        if num_real:
            r_uv, r_d = uv[num_synt:], d[num_synt:]
            xyz = recover_xyz(r_uv, r_d)
            if u_scales is not None:
                xyz = xyz.at[..., 0].divide(u_scales[:, None])
                xyz = xyz.at[..., 1].divide(v_scales[:, None])
            hm = (num_real, num_view, _C.num_joints) + r_uv.shape[-2:]
            real_uv.append(r_uv.reshape(hm))
            real_d.append(r_d.reshape(hm))
            real_xyz.append(xyz.reshape(num_real, num_view, _C.num_joints, 3))

    return EstimatorOutput(
        synt_uv_hms=tuple(synt_uv),
        synt_d_hms=tuple(synt_d),
        synt_xyz=tuple(synt_xyz),
        real_uv_hms=tuple(real_uv),
        real_d_hms=tuple(real_d),
        real_xyz=tuple(real_xyz),
        real_resized_dms=(
            combined[num_synt:] if (num_real and train and real_aug) else None
        ),
        synt_latent=tuple(lat[:num_synt] for lat in latents) if num_synt else (),
        real_latent=tuple(lat[num_synt:] for lat in latents) if num_real else (),
    )
