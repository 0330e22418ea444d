"""Engine configuration — one dataclass tree mirroring the reference CLI.

The reference spreads configuration across argparse flags
(network/run_engine.py:9-31), hardcoded loss weights
(create_network_and_criterion.py:171-181) and a constants class. Here the
flag surface is one frozen dataclass; the CLI in
:mod:`spherehand_tpu.train.cli` exposes the same names with the same
default-on toggles.
"""
from __future__ import annotations

import dataclasses

from spherehand_tpu.losses.multitask import LossConfig


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    # Loss toggles (run_engine.py:10-16; default-on except temporal).
    synthesize: bool = True
    mv_projection: bool = True
    mv_consistency: bool = True
    temporal: bool = False
    collision: bool = True
    bone_length: bool = True
    prior: bool = True

    # Run control (run_engine.py:17-30).
    mode: str = "Test"  # "Train" | "Test"
    model_dir: str = "runs"
    initial_model: str | None = None
    restore_from_model: str | None = None
    restore_from_epoch: int = -1
    num_stacks: int = 1
    epoch: int = 75
    dataset_dir: str = "data/nyu/npy-64"
    depth_resample: int = 0  # 0 = off, else Gaussian kernel size (3 or 5)
    lr: float = 1e-3
    tag: str = ""

    # Batch geometry (engine.py:271-272,326-330).
    real_batch: int = 25
    synt_batch: int = 48
    eval_batch: int = 8
    synt_iters_per_epoch: int = 1000  # x num_stacks (engine.py:280)
    mv_curriculum_iters: int = 1500  # is_mv window per epoch (engine.py:361)

    # TPU-specific.
    seed: int = 0
    weight_decay: float = 1e-5
    data_parallel: bool = True  # shard batches over all local devices
    bf16: bool = False  # bfloat16 conv compute (params/losses stay f32)
    mesh: str = "full"  # "full" | "lite": hand mesh for synthetic renders
    # (tools/make_lite_mesh.py; same bones/keypoints/spheres, ~half the
    # triangles — faster raster, sub-output-pixel depth differences)
    eval_precision: str = "default"  # "default" | "highest": eval-time conv
    # pass precision. TPU's default f32 convs run bf16 passes, making
    # per-sample outputs depend on batch composition (up to ~5 mm on
    # ambiguous samples — infer.py); "highest" forces true-f32 passes so
    # eval numbers are batch-invariant (the parity-grade mode; measured
    # +11% device time at B=128 — the eval pipeline is not conv-bound —
    # tests/goldens/precision_wobble.json). Train steps are unaffected
    # either way.
    steps_per_call: int = 1  # combined-epoch steps scanned per dispatch;
    # K>1 stacks K real batches and lax.scans the step K times inside one
    # jitted call (same keys/batches/curriculum as K=1) — robust to high
    # host<->device dispatch latency
    device_data: str = "auto"  # "auto" | "on" | "off": upload each real
    # split to device HBM once and gather batches INSIDE the jitted step —
    # the per-step host->device transfer drops to the index vector. NYU at
    # reference scale is ~3.5 GB (fits one v5e's 16 GB). Batches are
    # bit-identical to the host loader path (same index plan). "auto" = on
    # for single-process runs whose split fits device_data_max_gb; the
    # split replicates per device on a data mesh; multi-process runs use
    # the host per-process loader.
    device_data_max_gb: float = 6.0

    @property
    def loss_config(self) -> LossConfig:
        return LossConfig(
            synthesized=self.synthesize,
            mv_projection=self.mv_projection,
            mv_consistency=self.mv_consistency,
            temporal=self.temporal,
            prior=self.prior,
            collision=self.collision,
            bone_length=self.bone_length,
        )

    @property
    def with_real(self) -> bool:
        """Any real-data loss enabled (engine.py:138-139)."""
        return any(
            [
                self.mv_projection,
                self.mv_consistency,
                self.temporal,
                self.prior,
                self.collision,
                self.bone_length,
            ]
        )

    def lr_at_epoch(self, epoch: int) -> float:
        """StepLR: x0.1 every epoch//3 epochs (engine.py:98-99)."""
        step_size = max(self.epoch // 3, 1)
        return self.lr * (0.1 ** (epoch // step_size))
