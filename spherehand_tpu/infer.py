"""Inference API: depth crops -> 3D hand joints (the serving surface).

The reference exposes estimation only through the eval loop
(network/engine.py:150-263); this module packages it as a reusable,
jit-compiled predictor: hourglass forward on scaled 64x64 depth crops,
soft-argmax recovery from the final stack, optional palm denoising (the
eval-time post-process, engine.py:203-205) and optional template palm
adjustment (mesh/adjust_palm_pose.py).
"""
from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from spherehand_tpu.constants import Constants
from spherehand_tpu.evaluation.palm_adjust import adjust_palm_pose
from spherehand_tpu.models.estimator import forward, make_network
from spherehand_tpu.models.pose_denoiser import load_pose_denoiser

_C = Constants()


class PoseEstimator:
    """Stateful convenience wrapper around the jitted prediction function.

    Parameters
    ----------
    params: hourglass flax params (from a checkpoint or Engine state).
    num_stacks: stack count the params were trained with.
    denoise: apply the frozen palm denoiser MLP to the output.
    serve_chunk: large batches run as a ``lax.scan`` over chunks of this
        size inside the one jitted program. XLA picks pathological layouts
        for the (B, J, 64, 64) heatmap tensors at large B (measured on
        TPU v5e: B=1024 monolithic 18.9 ms device vs 8.2 ms as 8x128 —
        per-fusion time inflates ~18x for 8x the batch), while per-chunk
        throughput peaks around B=128. Batches are padded up to a chunk
        multiple; pad rows are dropped before returning.

        Chunking is exactly per-sample on CPU (f32). On TPU, conv passes
        run in bfloat16 by default, so per-sample outputs already depend
        on batch composition/layout BEFORE chunking (measured: identical
        crops at B=128 vs inside B=1024 differ up to ~5 mm on ambiguous
        samples, mean ~0.1 mm — same magnitude chunked or not); the
        shipped eval numbers are measured through this same path.
    precision: conv pass precision. ``None`` = backend default (TPU: bf16
        passes, fastest, with the batch-composition dependence above);
        ``"highest"`` = true-f32 passes, batch-invariant parity-grade
        outputs (used by tools/parity_eval.py). Cost: the conv passes
        alone are ~3x FLOPs in theory, but the forward pipeline is not
        conv-bound at serving batches — measured device cost is +11% at
        B=128 and +45% at a monolithic B=1024 program
        (tests/goldens/precision_wobble.json, scan-timed on-chip), so
        parity mode is cheap where it matters.
    mesh: optional ``jax.sharding.Mesh`` (e.g. ``parallel.mesh.data_mesh()``)
        to serve data-parallel: the batch is sharded over the mesh's
        ``data`` axis via ``jax.shard_map`` and each device runs the
        identical chunked predictor on its local rows — zero collectives
        (the whole pipeline is per-sample), so throughput scales linearly
        over ICI. Params and the denoiser are replicated. Batches are
        padded to a device multiple on the host (pad rows dropped before
        returning); ``serve_chunk`` applies PER DEVICE. The reference has
        no serving path, let alone a multi-GPU one (estimation exists only
        inside its single-GPU eval loop, network/engine.py:150-263 with
        bare ``.cuda()`` placement, engine.py:55-87).
    """

    def __init__(self, params: Any, num_stacks: int = 1, denoise: bool = True,
                 serve_chunk: int = 128, precision: Any = None,
                 mesh: Any = None):
        self.network = make_network(num_stacks, precision=precision)
        self.params = params
        self.denoise = denoise
        self.serve_chunk = serve_chunk
        self.mesh = mesh
        self._batch_multiple = int(mesh.devices.size) if mesh is not None else 1
        if denoise:
            self._denoiser, self._denoiser_params = load_pose_denoiser()

        def _predict_chunk(params, dms):
            out = forward(self.network, params, real_dms=dms[:, None], train=False)
            joints = out.real_xyz[-1][:, 0]
            if denoise:
                joints = self._denoiser.apply(
                    {"params": self._denoiser_params}, joints
                )
            heatmaps = out.real_uv_hms[-1][:, 0]
            return joints, heatmaps

        def _predict_local(params, dms):
            """Chunk-scanned predictor over the (local) batch rows."""
            b = dms.shape[0]
            if b <= serve_chunk:
                return _predict_chunk(params, dms)
            pad = (-b) % serve_chunk
            if pad:
                dms = jnp.concatenate([dms, dms[:pad]], axis=0)
            xs = dms.reshape(-1, serve_chunk, *dms.shape[1:])

            def body(_, xc):
                return None, _predict_chunk(params, xc)

            _, (joints, heatmaps) = jax.lax.scan(body, None, xs)
            joints = joints.reshape(-1, *joints.shape[2:])[:b]
            heatmaps = heatmaps.reshape(-1, *heatmaps.shape[2:])[:b]
            return joints, heatmaps

        if mesh is None:
            self._predict = jax.jit(_predict_local)
        else:
            from jax.sharding import PartitionSpec as P

            # Each device runs _predict_local on its own batch rows; params
            # ride replicated. No collective is ever needed (per-sample
            # pipeline), so the shard_map body IS the single-device program.
            self._predict = jax.jit(
                jax.shard_map(
                    _predict_local,
                    mesh=mesh,
                    in_specs=(P(), P("data")),
                    out_specs=P("data"),
                )
            )

    def _pad_to_mesh(self, dms: np.ndarray) -> tuple[np.ndarray, int]:
        """Pad the host batch to a device-count multiple (shard_map needs
        equal local blocks); returns (padded, original_b)."""
        b = dms.shape[0]
        pad = (-b) % self._batch_multiple
        if pad:
            dms = np.concatenate(
                [dms, np.repeat(dms[-1:], pad, axis=0)], axis=0
            )
        return dms, b

    def predict(
        self, depth_mm: np.ndarray, palm_adjust: bool = False
    ) -> np.ndarray:
        """Depth crops (B, 64, 64) in mm (background 100) -> joints (B, 41, 3).

        Input follows the NYU crop convention (300 mm cube, orthographic).
        """
        host, b = self._pad_to_mesh(np.asarray(depth_mm, np.float32))
        dms = jnp.asarray(host) * _C.depth_scale
        joints, _ = self._predict(self.params, dms)
        joints = np.asarray(joints)[:b]
        if palm_adjust:
            joints = np.stack([adjust_palm_pose(j) for j in joints])
        return joints

    def predict_with_heatmaps(self, depth_mm: np.ndarray):
        host, b = self._pad_to_mesh(np.asarray(depth_mm, np.float32))
        dms = jnp.asarray(host) * _C.depth_scale
        joints, heatmaps = self._predict(self.params, dms)
        return np.asarray(joints)[:b], np.asarray(heatmaps)[:b]


def load_params_npz(path: str) -> dict:
    """Load flax params from a flattened 'a/b/c'-keyed .npz archive
    (the release-artifact format written by train.priors.save_flax_params_npz;
    see assets/pretrained/synthetic_params.npz)."""
    tree: dict = {}
    with np.load(path) as raw:
        for key in raw.files:
            node = tree
            parts = key.split("/")
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            node[parts[-1]] = raw[key]
    return tree


def load_estimator(
    checkpoint_path: str, num_stacks: int = 1, denoise: bool = True
) -> PoseEstimator:
    """Build a PoseEstimator from an Orbax checkpoint directory."""
    import orbax.checkpoint as ocp

    from spherehand_tpu.hand.assets import load_hand_model
    from spherehand_tpu.train.config import EngineConfig
    from spherehand_tpu.train.steps import build_steps

    steps = build_steps(EngineConfig(num_stacks=num_stacks), load_hand_model())
    template = steps.init_state(jax.random.key(0))
    import os

    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(checkpoint_path), template)
    return PoseEstimator(restored.params, num_stacks=num_stacks, denoise=denoise)
