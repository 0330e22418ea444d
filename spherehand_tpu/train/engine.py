"""Training/eval engine: epoch orchestration, checkpointing, observability.

Re-design of the reference's ``network/engine.py`` (Engine :52-477). Same
run semantics — random 6-char run dirs, ``loss_weights.txt`` manifest, three
epoch modes (synthetic-only / real-only / combined), StepLR-per-epoch, the
``is_mv`` curriculum window, per-epoch checkpoints plus a rolling latest,
eval = view-0 + denoiser metric — re-built around jitted steps:

- the device never waits on Python between steps: real batches are gathered
  from memmaps and ``device_put`` sharded while the previous step runs;
- metrics stay device-side; the RunningAverage only materializes at the log
  cadence (the reference forces a `.cpu()` sync every iteration,
  utils_metric.py:9-10);
- checkpoints are Orbax; ``--initial_model`` loads weights only while
  ``--restore_from_model`` restores optimizer state and the LR-schedule epoch
  (engine.py:105-123,446-460);
- metrics additionally stream to ``metrics.jsonl`` for machine consumption.
"""
from __future__ import annotations

import dataclasses
import json
import os
import random
import string
import time
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from spherehand_tpu.constants import Constants
from spherehand_tpu.data.nyu import NyuDataset, NyuLoader
from spherehand_tpu.hand.assets import load_hand_model
from spherehand_tpu.losses.multitask import LOSS_WEIGHTS
from spherehand_tpu.parallel import (
    batch_sharding,
    data_mesh,
    replicated,
    scan_batch_sharding,
)
from spherehand_tpu.train.config import EngineConfig
from spherehand_tpu.train.steps import RealBatch, build_steps
from spherehand_tpu.utils.profiling import StepTimer
from spherehand_tpu import viz

_C = Constants()


class RunningAverage:
    """Device-friendly metric accumulator (reference engine.py:30-49): sums
    stay as device arrays; conversion happens only when printed."""

    def __init__(self):
        self.num = 0
        self.sums: dict[str, Any] = {}

    def append(self, metrics: dict) -> None:
        for k, v in metrics.items():
            self.sums[k] = v if k not in self.sums else self.sums[k] + v
        self.num += 1

    def to_dict(self) -> dict[str, float]:
        return {k: float(v) / self.num for k, v in self.sums.items()}

    def __str__(self) -> str:
        return " ".join(f"{k}: {v:.4f}" for k, v in self.to_dict().items())


def _rand_name(n: int = 6) -> str:
    return "".join(random.choice(string.ascii_letters + string.digits) for _ in range(n))


def _fmt(avg: dict[str, float]) -> str:
    return " ".join(f"{k}: {v:.4f}" for k, v in avg.items())


def _prefetch(iterable, depth: int = 2):
    """Background-thread prefetch: the loader's memmap gather + decode runs
    while the previous step's device work is in flight. If the consumer
    abandons the generator mid-epoch (step exception, Ctrl-C), the worker
    notices via the stop event within 0.5 s and exits instead of blocking on
    the full queue forever."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()
    sentinel = object()

    def _put(x) -> bool:
        while not stop.is_set():
            try:
                q.put(x, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for x in iterable:
                if not _put(x):
                    return
            _put(sentinel)
        except BaseException as e:  # surface loader errors in the main thread
            _put(e)

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            x = q.get()
            if x is sentinel:
                return
            if isinstance(x, BaseException):
                raise x
            yield x
    finally:
        stop.set()


class Engine:
    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg
        # "lite" swaps in the decimated mesh (identical bones/keypoints/
        # spheres, so every loss and metric is unaffected; only the synthetic
        # depth raster sees the smaller triangle set).
        self.hand = load_hand_model(lite=cfg.mesh == "lite")

        # Data-parallel mesh: batches shard over the leading axis, state is
        # replicated; on one device this degenerates to plain jit. Batch
        # sizes that do not divide the mesh (the reference defaults 25/48/8
        # on 8 chips) are padded up with duplicate rows at loss-weight zero —
        # the objective is exactly the single-device one (ops.reduce).
        # Exception: the temporal-smoothness loss compares consecutive batch
        # rows, so padding would corrupt it; with --temporal the mesh falls
        # back to the largest device count dividing every batch size.
        if cfg.data_parallel:
            avail = len(jax.devices())
            if cfg.temporal:
                n = max(
                    n for n in range(1, avail + 1)
                    if cfg.real_batch % n == 0
                    and cfg.synt_batch % n == 0
                    and cfg.eval_batch % n == 0
                )
                if n < avail:
                    print(
                        f"[engine] --temporal: data-parallel over {n}/{avail} "
                        f"devices (padding is incompatible with the "
                        f"consecutive-frame loss)"
                    )
            else:
                n = avail
            self.mesh = data_mesh(jax.devices()[:n])
        else:
            n = 1
            self.mesh = data_mesh(jax.devices()[:1])
        self._n_devices = n
        self._batch_sharding = batch_sharding(self.mesh)
        self._scan_batch_sharding = scan_batch_sharding(self.mesh)
        self._replicated = replicated(self.mesh)
        self.steps = build_steps(
            cfg,
            self.hand,
            synt_pad=(-cfg.synt_batch) % n,
            data_sharding=self._batch_sharding if n > 1 else None,
        )

        self._jit_synt = jax.jit(self.steps.synt_step, donate_argnums=0)
        self._jit_combined = jax.jit(self.steps.combined_step, donate_argnums=0)
        self._jit_real = jax.jit(self.steps.real_step, donate_argnums=0)
        self._jit_eval = jax.jit(self.steps.eval_step)
        self._build_acc_steps()
        self._metric_zero_cache: dict[str, Any] = {}

        self.base_key = jax.random.key(cfg.seed)
        self.state = jax.device_put(
            self.steps.init_state(jax.random.key(cfg.seed + 1)), self._replicated
        )
        self.starting_epoch = 0

        # Run directory (reference engine.py:102-117).
        if cfg.restore_from_model is not None:
            self.model_name = cfg.restore_from_model
            self.model_path = os.path.join(cfg.model_dir, self.model_name)
            self.load_checkpoint(cfg.restore_from_epoch)
        else:
            self.model_name = cfg.tag + _rand_name()
            self.model_path = os.path.join(cfg.model_dir, self.model_name)
            os.makedirs(self.model_path, exist_ok=True)
        print(f"[engine] run dir: {self.model_path}")

        with open(os.path.join(self.model_path, "loss_weights.txt"), "w") as f:
            json.dump(LOSS_WEIGHTS, f)
        with open(os.path.join(self.model_path, "config.json"), "w") as f:
            json.dump(dataclasses.asdict(cfg), f, indent=2)

        if cfg.initial_model is not None:
            self.load_checkpoint(cfg.initial_model, weights_only=True)

        self.log_file = os.path.join(self.model_path, "log.txt")
        self.metrics_file = os.path.join(self.model_path, "metrics.jsonl")
        self.image_dir = os.path.join(self.model_path, "images")
        os.makedirs(self.image_dir, exist_ok=True)

        # Real datasets load lazily: synthetic-only runs need none.
        self._train_data = self._eval_data = None

    # ----------------------------------------------------- accumulating jits
    def _build_acc_steps(self) -> None:
        """Jitted step wrappers with key derivation, the is_mv curriculum and
        the metric running sums INSIDE the program.

        The plain per-step host loop costs ~12 ms/step through a remote-
        device tunnel: 2 eager ``fold_in`` dispatches for the step key plus
        one eager add per metric for the running average. Folding them into
        the step leaves ONE dispatch per step; the sums are fetched only at
        the log cadence. Key derivation is bit-identical to the host path
        (``fold_in(fold_in(base_key, epoch), it)``), so training runs are
        unchanged step for step.
        """
        steps = self.steps
        cfg = self.cfg

        def _key(base_key, epoch_it):
            return jax.random.fold_in(
                jax.random.fold_in(base_key, epoch_it[0]), epoch_it[1]
            )

        def _add(sums, metrics):
            return {k: sums[k] + v for k, v in metrics.items()}

        def synt_acc(state, base_key, epoch_it, lr, sums):
            state, metrics = steps.synt_step(state, _key(base_key, epoch_it), lr)
            return state, metrics, _add(sums, metrics)

        def combined_acc(state, base_key, epoch_it, lr, batch, sums):
            is_mv = epoch_it[1] < cfg.mv_curriculum_iters  # engine.py:361
            state, metrics, vis = steps.combined_step(
                state, _key(base_key, epoch_it), lr, batch, is_mv
            )
            return state, metrics, vis, _add(sums, metrics)

        def real_acc(state, base_key, epoch_it, lr, batch, sums):
            state, metrics, vis = steps.real_step(
                state, _key(base_key, epoch_it), lr, batch
            )
            return state, metrics, vis, _add(sums, metrics)

        def combined_scan(state, base_key, epoch, its, lr, batches, sums):
            """K steps per dispatch: ``its`` (K,) global iteration ids,
            ``batches`` a RealBatch with a leading K axis. Keys and the
            curriculum compare use the same per-it derivation as K=1 — the
            run is step-for-step equivalent (identical losses; the scanned
            step's backward compiles with different reduction order than
            the standalone step, so params drift at f32 rounding level).
            The first K-1 steps scan with no per-step outputs; the last
            step runs unrolled so its metrics/vis come back at O(1) memory
            (stacking vis across the scan would hold K image sets in HBM)."""
            ekey = jax.random.fold_in(base_key, epoch)

            def one(st, i, batch, sums):
                is_mv = i < cfg.mv_curriculum_iters
                st, metrics, vis = steps.combined_step(
                    st, jax.random.fold_in(ekey, i), lr, batch, is_mv
                )
                return st, metrics, vis, _add(sums, metrics)

            def body(carry, inp):
                st, sums = carry
                i, batch = inp
                st, _, _, sums = one(st, i, batch, sums)
                return (st, sums), None

            head = jax.tree.map(lambda x: x[:-1], (its, batches))
            (state, sums), _ = jax.lax.scan(body, (state, sums), head)
            last_batch = jax.tree.map(lambda x: x[-1], batches)
            state, metrics, vis, sums = one(state, its[-1], last_batch, sums)
            return state, metrics, vis, sums

        def _gather_batch(data, idx, w):
            """Device-side batch materialization from the resident split.
            idx may carry a leading K (scan) axis; rows are whole records
            (V x 64 x 64 dms), not thin gathers — MXU-friendly per the
            take_along_axis gotcha."""
            return RealBatch(
                data["dms"][idx], data["joints"][idx],
                data["poses"][idx], data["inv_poses"][idx], w,
            )

        def combined_acc_dev(state, base_key, epoch_it, lr, data, idx, w,
                             sums):
            return combined_acc(
                state, base_key, epoch_it, lr, _gather_batch(data, idx, w),
                sums,
            )

        def real_acc_dev(state, base_key, epoch_it, lr, data, idx, w, sums):
            return real_acc(
                state, base_key, epoch_it, lr, _gather_batch(data, idx, w),
                sums,
            )

        def combined_scan_dev(state, base_key, epoch, its, lr, data, idxs,
                              ws, sums):
            return combined_scan(
                state, base_key, epoch, its, lr,
                _gather_batch(data, idxs, ws), sums,
            )

        def eval_dev(params, key, data, idx, w):
            return steps.eval_step(params, key, _gather_batch(data, idx, w))

        self._jit_synt_acc = jax.jit(synt_acc, donate_argnums=(0, 4))
        self._jit_combined_acc = jax.jit(combined_acc, donate_argnums=(0, 5))
        self._jit_real_acc = jax.jit(real_acc, donate_argnums=(0, 5))
        self._jit_combined_scan = jax.jit(combined_scan, donate_argnums=(0, 6))
        self._jit_combined_acc_dev = jax.jit(
            combined_acc_dev, donate_argnums=(0, 7)
        )
        self._jit_real_acc_dev = jax.jit(real_acc_dev, donate_argnums=(0, 7))
        self._jit_combined_scan_dev = jax.jit(
            combined_scan_dev, donate_argnums=(0, 8)
        )
        self._jit_eval_dev = jax.jit(eval_dev)

    def _metric_zeros(self, kind: str, eval_fn) -> dict:
        """Zero-valued metric sums matching a step's metric tree (host-side
        ``jax.eval_shape`` — no device work; cached per step kind)."""
        if kind not in self._metric_zero_cache:
            shapes = eval_fn()
            self._metric_zero_cache[kind] = {
                k: np.zeros(s.shape, s.dtype) for k, s in shapes.items()
            }
        return dict(self._metric_zero_cache[kind])

    def _fetch_avg(self, sums: dict, count: int) -> dict[str, float]:
        """Materialize the device-side running sums as per-step means."""
        vals = jax.device_get(sums)
        return {k: float(v) / count for k, v in vals.items()}

    # ------------------------------------------------------------------ data
    def _split(self, train: bool) -> NyuDataset:
        subset = "train" if train else "test"
        if train and self._train_data is None:
            self._train_data = NyuDataset(os.path.join(self.cfg.dataset_dir, subset))
        if not train and self._eval_data is None:
            self._eval_data = NyuDataset(os.path.join(self.cfg.dataset_dir, subset))
        return self._train_data if train else self._eval_data

    def _real_loader(self, train: bool, batch_size: int,
                     epoch: int = 0) -> NyuLoader:
        data = self._split(train)
        shuffle = train and not self.cfg.temporal  # engine.py:326-327
        return NyuLoader(data, batch_size, shuffle, seed=self.cfg.seed,
                         epoch=epoch)

    def _resident(self, train: bool):
        """Device-resident copy of a real split, or None (host loader path).

        NYU at reference scale is ~3.5 GB — it FITS in one v5e's 16 GB HBM,
        so the TPU-native data path uploads each split once and gathers
        batches INSIDE the jitted step: per-dispatch host->device traffic
        shrinks from the batch arrays (~1.2 MB x K) to the index vector
        (~100 B x K), taking the epoch loop off the host/tunnel bandwidth
        path entirely. Batches are bit-identical to the host loader's (same
        index plan via NyuLoader.iter_index_batches, gathers are exact).
        On a data mesh the split is REPLICATED per device; multi-process
        runs fall back to the host per-process loader.
        """
        cfg = self.cfg
        if cfg.device_data == "off":
            return None
        if jax.process_count() > 1:
            if cfg.device_data == "on":
                raise ValueError(
                    "device_data='on' is single-process only (the resident "
                    "split replicates per device; multi-host input sharding "
                    "uses the host loader)"
                )
            return None
        cache = "_resident_train_arrays" if train else "_resident_eval_arrays"
        cached = getattr(self, cache, None)
        if cached is not None:
            return cached or None  # {} sentinel = checked, too big
        ds = self._split(train)
        nbytes = sum(m.nbytes for m in ds.dms) + sum(
            a.nbytes for a in ds.joint_poses + ds.camera_poses
            + ds.inv_camera_poses
        )
        if nbytes > cfg.device_data_max_gb * 2**30:
            if cfg.device_data == "auto":
                setattr(self, cache, {})
                print(f"[engine] device_data auto: split is "
                      f"{nbytes / 2**30:.1f} GiB > {cfg.device_data_max_gb} GiB "
                      f"cap, using the host loader")
                return None
            # Explicit 'on': proceed, but make a mid-upload device OOM
            # attributable to the split size rather than opaque (ADVICE r4).
            print(f"[engine] device_data on: split is "
                  f"{nbytes / 2**30:.1f} GiB > the {cfg.device_data_max_gb} "
                  f"GiB auto cap — uploading anyway (replicated per device; "
                  f"a device OOM during the shard concat means this split "
                  f"does not fit)")
        # Shard-by-shard upload + on-device concat bounds host RAM at one
        # shard; peak device memory is 2x the split during the concat.
        def up(parts):
            if len(parts) == 1:
                return jax.device_put(np.ascontiguousarray(parts[0]),
                                      self._replicated)
            return jnp.concatenate(
                [jax.device_put(np.ascontiguousarray(p), self._replicated)
                 for p in parts], axis=0
            )
        t0 = time.time()
        arrays = {
            "dms": up(ds.dms),
            "joints": up(ds.joint_poses),
            "poses": up(ds.camera_poses),
            "inv_poses": up(ds.inv_camera_poses),
        }
        jax.block_until_ready(arrays)
        setattr(self, cache, arrays)
        print(f"[engine] device-resident {'train' if train else 'test'} "
              f"split: {nbytes / 2**20:.0f} MiB uploaded once "
              f"in {time.time() - t0:.1f}s")
        return arrays

    def _pad_idx(self, idx: np.ndarray):
        """Index-plan twin of _pad_batch: wraparound duplicate indices at
        loss-weight zero, so device-side gathers build the identical padded
        batch."""
        idx = np.asarray(idx)
        n = self._n_devices
        b = idx.shape[0]
        pad = (-b) % n
        if not pad:
            return idx.astype(np.int32), None
        idxp = np.concatenate([idx, idx[np.arange(pad) % b]]).astype(np.int32)
        w = np.concatenate(
            [np.ones(b, np.float32), np.zeros(pad, np.float32)]
        )
        return idxp, w

    def _feed(self, loader: NyuLoader, data):
        """Per-step feed: host path yields uploaded RealBatches (prefetch
        thread hides the memmap gather); device path yields tiny
        (idx, weights) device tuples — the resident split never re-uploads."""
        if data is None:
            for raw in _prefetch(loader):
                yield self._put_batch(raw)
        else:
            for idx in loader.iter_index_batches():
                yield jax.device_put(
                    self._pad_idx(idx), self._batch_sharding
                )

    def _sds_batch(self, data, batch: int, w) -> RealBatch:
        """ShapeDtypeStruct RealBatch for eval_shape on the device path."""
        parts = [
            jax.ShapeDtypeStruct((batch,) + tuple(data[k].shape[1:]),
                                 data[k].dtype)
            for k in ("dms", "joints", "poses", "inv_poses")
        ]
        wq = None if w is None else jax.ShapeDtypeStruct(
            (batch,), jnp.float32
        )
        return RealBatch(*parts, wq)

    def _pad_batch(self, raw) -> RealBatch:
        """Host-side padding: the leading axis grows to a multiple of the
        device count with wraparound duplicate rows at loss weight 0
        (duplicates keep every loss term finite; the weights erase their
        contribution — spherehand_tpu.ops.reduce)."""
        dms, joints, poses, inv_poses = (np.asarray(x) for x in raw)
        n = self._n_devices
        b = dms.shape[0]
        pad = (-b) % n
        weights = None
        if pad:
            idx = np.concatenate([np.arange(b), np.arange(pad) % b])
            dms, joints, poses, inv_poses = (
                x[idx] for x in (dms, joints, poses, inv_poses)
            )
            weights = np.zeros(b + pad, np.float32)
            weights[:b] = 1.0
        return RealBatch(dms, joints, poses, inv_poses, weights)

    def _put_batch(self, raw) -> RealBatch:
        """Pad + shard one host batch over the mesh."""
        dms, joints, poses, inv_poses, weights = self._pad_batch(raw)

        if jax.process_count() > 1:
            # Per-host input sharding: each process provides only its local
            # rows on multi-host slices.
            def put(x):
                if x is None:
                    return None
                if hasattr(jax, "make_array_from_process_local_data"):
                    return jax.make_array_from_process_local_data(
                        self._batch_sharding, x
                    )
                return jax.device_put(x, self._batch_sharding)

            return RealBatch(
                put(dms), put(joints), put(poses), put(inv_poses), put(weights)
            )
        # Single host: ONE device_put over the whole pytree (per-leaf eager
        # puts cost a dispatch round trip each through a remote-device tunnel).
        return jax.device_put(
            RealBatch(dms, joints, poses, inv_poses, weights),
            self._batch_sharding,
        )

    def _put_batches(self, raws) -> RealBatch:
        """Pad K host batches, stack them on a NEW leading axis (K, B, ...)
        and upload once — the operand of the steps_per_call scan. The batch
        axis (now axis 1) still shards over the mesh; the scan axis
        replicates. On multi-host slices each process provides its local
        (K, B_local, ...) stack and the global batch axis concatenates the
        hosts' rows (tests/test_multihost.py drives this on a 2-process
        gloo CPU harness)."""
        padded = [self._pad_batch(raw) for raw in raws]
        stacked = RealBatch(*(
            None if leaves[0] is None else np.stack(leaves)
            for leaves in zip(*padded)
        ))
        if jax.process_count() > 1:
            def put(x):
                if x is None:
                    return None
                return jax.make_array_from_process_local_data(
                    self._scan_batch_sharding, x
                )

            return RealBatch(*(put(leaf) for leaf in stacked))
        return jax.device_put(stacked, self._scan_batch_sharding)

    # ------------------------------------------------------------- utilities
    def _log(self, text: str) -> None:
        print(text)
        with open(self.log_file, "a") as f:
            f.write(text + "\n")

    def _log_metrics(self, record: dict) -> None:
        with open(self.metrics_file, "a") as f:
            f.write(json.dumps(record) + "\n")

    def _step_key(self, epoch: int, it: int) -> jax.Array:
        return jax.random.fold_in(jax.random.fold_in(self.base_key, epoch), it)

    # ----------------------------------------------------------- checkpoints
    def save_checkpoint(self, epoch: int) -> None:
        """Per-epoch checkpoint + rolling latest (reference engine.py:438-444,
        471-474 saves model_{-1} then model_{epoch})."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.model_path, f"model_{epoch}"))
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, self.state, force=True)
        with open(os.path.join(self.model_path, f"model_{epoch}.meta.json"), "w") as f:
            json.dump({"epoch": epoch, "step": int(self.state.step)}, f)

    def load_checkpoint(self, which: int | str, weights_only: bool = False) -> None:
        """int -> epoch under this run dir (full resume); str -> explicit path
        (weights only when ``weights_only``), matching engine.py:446-460."""
        import orbax.checkpoint as ocp

        if isinstance(which, int):
            path = os.path.abspath(os.path.join(self.model_path, f"model_{which}"))
            meta_path = os.path.join(self.model_path, f"model_{which}.meta.json")
        else:
            path = os.path.abspath(which)
            meta_path = path + ".meta.json"
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(path, self.state)
        restored = jax.device_put(restored, self._replicated)
        if weights_only:
            self.state = self.state.replace(params=restored.params)
        else:
            self.state = restored
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    self.starting_epoch = json.load(f)["epoch"]

    # ---------------------------------------------------------------- epochs
    def _epoch_synt(self, epoch: int) -> None:
        """Synthetic-only pretraining epoch (engine.py:265-316)."""
        cfg = self.cfg
        lr = jnp.asarray(cfg.lr_at_epoch(epoch))
        sums = self._metric_zeros(
            "synt",
            lambda: jax.eval_shape(
                self.steps.synt_step, self.state, self.base_key, lr
            )[1],
        )
        t0 = time.time()
        iters = cfg.synt_iters_per_epoch * cfg.num_stacks
        for it in range(iters):
            self.state, metrics, sums = self._jit_synt_acc(
                self.state, self.base_key,
                np.asarray([epoch, it], np.int32), lr, sums,
            )
            if it % 100 == 0:
                avg = self._fetch_avg(sums, it + 1)
                dt = time.time() - t0
                self._log(
                    f"[{epoch}-{it}]: loss: {_fmt(avg)} lr: {float(lr):.2e} "
                    f"time: {dt:.2f}s"
                )
                self._log_metrics(
                    {"epoch": epoch, "it": it, "mode": "synt", **avg}
                )
                t0 = time.time()

    def _epoch_combined(self, epoch: int) -> None:
        """Mixed synthetic + real self-supervised epoch (engine.py:318-436)."""
        if self.cfg.steps_per_call > 1:
            return self._epoch_combined_scan(epoch)
        cfg = self.cfg
        lr = jnp.asarray(cfg.lr_at_epoch(epoch))
        loader = self._real_loader(train=True, batch_size=cfg.real_batch,
                                   epoch=epoch)
        data = self._resident(train=True)
        timer = StepTimer(window=100)
        sums = None
        t0 = time.time()
        for it, fed in enumerate(self._feed(loader, data)):
            if sums is None:
                batch_like = (
                    fed if data is None
                    else self._sds_batch(data, fed[0].shape[0], fed[1])
                )
                sums = self._metric_zeros(
                    "combined",
                    lambda: jax.eval_shape(
                        self.steps.combined_step, self.state, self.base_key,
                        lr, batch_like, jnp.asarray(True),
                    )[1],
                )
            if data is None:
                self.state, metrics, vis, sums = self._jit_combined_acc(
                    self.state, self.base_key,
                    np.asarray([epoch, it], np.int32), lr, fed, sums,
                )
            else:
                self.state, metrics, vis, sums = self._jit_combined_acc_dev(
                    self.state, self.base_key,
                    np.asarray([epoch, it], np.int32), lr, data,
                    fed[0], fed[1], sums,
                )
            timer.tick(metrics["loss"])  # blocks only at window edges
            if it % 400 == 0:
                self._dump_train_images(epoch, it, vis)
            if it % 100 == 0:
                avg = self._fetch_avg(sums, it + 1)
                dt = time.time() - t0
                self._log(
                    f"[{epoch}-{it}]: metric+loss: {_fmt(avg)} "
                    f"lr: {float(lr):.2e} "
                    f"steps/s: {timer.steps_per_sec:.2f} time: {dt:.2f}s"
                )
                self._log_metrics(
                    {
                        "epoch": epoch, "it": it, "mode": "both",
                        "steps_per_sec": timer.steps_per_sec, **avg,
                    }
                )
                t0 = time.time()

    def _epoch_combined_scan(self, epoch: int) -> None:
        """steps_per_call > 1: K combined steps lax.scanned per dispatch.

        Step-for-step equivalent to the per-step path (same per-it keys,
        batches and curriculum compares; the scanned compilation rounds
        differently at f32 level). K stacked real batches upload together
        and the scan runs them through the step without host round trips.
        Ragged leftovers at the epoch end run through the per-step
        accumulating jit."""
        cfg = self.cfg
        K = cfg.steps_per_call
        lr = jnp.asarray(cfg.lr_at_epoch(epoch))
        loader = self._real_loader(train=True, batch_size=cfg.real_batch,
                                   epoch=epoch)
        data = self._resident(train=True)
        timer = StepTimer(window=max(1, 100 // K))
        sums = None
        it = 0
        buf = []
        t0 = time.time()
        logged_any = False

        def ensure_sums(batch_like):
            return self._metric_zeros(
                "combined",
                lambda: jax.eval_shape(
                    self.steps.combined_step, self.state, self.base_key, lr,
                    batch_like, jnp.asarray(True),
                )[1],
            )

        def _crossed(prev: int, it: int, period: int) -> bool:
            """A multiple of ``period`` lies in [prev, it)."""
            return ((prev + period - 1) // period) * period < it

        def log_window(prev, it, sums, vis):
            # fire when the chunk [prev, it) crossed a 100/400 boundary
            # (matches the K=1 path's it % N == 0, any K)
            nonlocal t0, logged_any
            done = it - 1  # last completed iteration id
            if vis is not None and _crossed(prev, it, 400):
                self._dump_train_images(epoch, done, vis)
            if _crossed(prev, it, 100):
                avg = self._fetch_avg(sums, it)
                dt = time.time() - t0
                sps = timer.steps_per_sec * K
                self._log(
                    f"[{epoch}-{done}]: metric+loss: {_fmt(avg)} "
                    f"lr: {float(lr):.2e} steps/s: {sps:.2f} time: {dt:.2f}s"
                )
                self._log_metrics(
                    {"epoch": epoch, "it": done, "mode": "both",
                     "steps_per_sec": sps, **avg}
                )
                t0 = time.time()
                logged_any = True

        vis = None
        src = (
            _prefetch(loader) if data is None else loader.iter_index_batches()
        )
        for raw in src:
            buf.append(raw)
            if len(buf) < K:
                continue
            if data is None:
                batches = self._put_batches(buf)
            else:
                plans = [self._pad_idx(i) for i in buf]
                ws = (
                    None if plans[0][1] is None
                    else np.stack([w for _, w in plans])
                )
                batches = jax.device_put(
                    (np.stack([i for i, _ in plans]), ws),
                    self._scan_batch_sharding,
                )
            buf = []
            if sums is None:
                if data is None:
                    one = jax.tree.map(
                        lambda x: jax.ShapeDtypeStruct(x.shape[1:], x.dtype),
                        batches,
                    )
                else:
                    one = self._sds_batch(
                        data, batches[0].shape[1], batches[1]
                    )
                sums = ensure_sums(one)
            its = jnp.asarray(np.arange(it, it + K, dtype=np.int32))
            if data is None:
                self.state, metrics, vis, sums = self._jit_combined_scan(
                    self.state, self.base_key, np.int32(epoch), its, lr,
                    batches, sums,
                )
            else:
                self.state, metrics, vis, sums = self._jit_combined_scan_dev(
                    self.state, self.base_key, np.int32(epoch), its, lr,
                    data, batches[0], batches[1], sums,
                )
            prev, it = it, it + K
            timer.tick(metrics["loss"])
            log_window(prev, it, sums, vis)

        for raw in buf:  # ragged tail, per-step
            fed = (
                self._put_batch(raw) if data is None
                else jax.device_put(self._pad_idx(raw), self._batch_sharding)
            )
            if sums is None:
                sums = ensure_sums(
                    fed if data is None
                    else self._sds_batch(data, fed[0].shape[0], fed[1])
                )
            if data is None:
                self.state, metrics, vis, sums = self._jit_combined_acc(
                    self.state, self.base_key,
                    np.asarray([epoch, it], np.int32), lr, fed, sums,
                )
            else:
                self.state, metrics, vis, sums = self._jit_combined_acc_dev(
                    self.state, self.base_key,
                    np.asarray([epoch, it], np.int32), lr, data,
                    fed[0], fed[1], sums,
                )
            prev, it = it, it + 1
            log_window(prev, it, sums, vis)
        if it > 0 and not logged_any:
            # short epoch (< 100 steps): still record one metrics line
            avg = self._fetch_avg(sums, it)
            self._log(
                f"[{epoch}-{it - 1}]: metric+loss: {_fmt(avg)} "
                f"lr: {float(lr):.2e} time: {time.time() - t0:.2f}s"
            )
            self._log_metrics(
                {"epoch": epoch, "it": it - 1, "mode": "both", **avg}
            )

    def _epoch_real_train(self, epoch: int) -> None:
        """Real-only self-supervised epoch, bs=8 (engine.py:150-263)."""
        cfg = self.cfg
        lr = jnp.asarray(cfg.lr_at_epoch(epoch))
        loader = self._real_loader(train=True, batch_size=cfg.eval_batch,
                                   epoch=epoch)
        data = self._resident(train=True)
        sums = None
        t0 = time.time()
        for it, fed in enumerate(self._feed(loader, data)):
            if sums is None:
                batch_like = (
                    fed if data is None
                    else self._sds_batch(data, fed[0].shape[0], fed[1])
                )
                sums = self._metric_zeros(
                    "real",
                    lambda: jax.eval_shape(
                        self.steps.real_step, self.state, self.base_key, lr,
                        batch_like,
                    )[1],
                )
            if data is None:
                self.state, metrics, vis, sums = self._jit_real_acc(
                    self.state, self.base_key,
                    np.asarray([epoch, it], np.int32), lr, fed, sums,
                )
            else:
                self.state, metrics, vis, sums = self._jit_real_acc_dev(
                    self.state, self.base_key,
                    np.asarray([epoch, it], np.int32), lr, data,
                    fed[0], fed[1], sums,
                )
            if it % 100 == 0:
                self._dump_real_images(epoch, it, vis)
                avg = self._fetch_avg(sums, it + 1)
                dt = time.time() - t0
                self._log(
                    f"[{epoch}-{it}]: metric+loss: {_fmt(avg)} "
                    f"lr: {float(lr):.2e} time: {dt:.2f}s"
                )
                self._log_metrics(
                    {"epoch": epoch, "it": it, "mode": "real", **avg}
                )
                t0 = time.time()

    def _dump_real_images(self, epoch: int, it: int, vis: dict) -> None:
        """Real-train-mode result grid every 100 its (reference dumps
        (dms, uv_hms, xyz) in ``_epoch_with_real`` Train mode too,
        engine.py:229-260)."""
        try:
            img = viz.result_grid(
                np.asarray(vis["real_dms"]).reshape(-1, 64, 64)[:6],
                np.asarray(vis["real_uv_hms"]).reshape(-1, 41, 16, 16)[:6],
                np.asarray(vis["real_xyz"]).reshape(-1, 41, 3)[:6],
            )
            viz.save_image(
                os.path.join(self.image_dir, f"Train_{epoch}_{it}.jpg"), img
            )
        except Exception as exc:  # visualization must never kill training
            self._log(f"[viz] dump failed: {exc}")

    def _dump_train_images(self, epoch: int, it: int, vis: dict) -> None:
        """Real + synthetic result grids (reference engine.py:386-434)."""
        try:
            # hstack needs equal grid heights: cap all three panels to the
            # smaller of 6 / real rows / synt rows (tiny-batch runs).
            n = min(6, vis["synt_dms"].shape[0],
                    int(np.prod(vis["real_dms"].shape[:-2])))
            real = viz.result_grid(
                np.asarray(vis["real_dms"]).reshape(-1, 64, 64)[:n],
                np.asarray(vis["real_uv_hms"]).reshape(-1, 41, 16, 16)[:n],
                np.asarray(vis["real_xyz"]).reshape(-1, 41, 3)[:n],
            )
            synt = viz.result_grid(
                np.asarray(vis["synt_dms"])[:n],
                np.asarray(vis["synt_uv_hms"])[:n],
                np.asarray(vis["synt_xyz"])[:n],
            )
            gt = viz.result_grid(
                np.asarray(vis["synt_dms"])[:n],
                np.asarray(vis["synt_gt_uv_hms"])[:n],
                np.asarray(vis["synt_gt_xyz"])[:n],
            )
            img = np.hstack([real, synt, gt])
            viz.save_image(
                os.path.join(self.image_dir, f"Train_{epoch}_{it}.jpg"), img
            )
        except Exception as exc:  # visualization must never kill training
            self._log(f"[viz] dump failed: {exc}")

    def _epoch_real_eval(self, epoch: int, dump_images: bool = False):
        cfg = self.cfg
        loader = self._real_loader(train=False, batch_size=cfg.eval_batch)
        data = self._resident(train=False)
        ds = self._split(train=False)
        avg = RunningAverage()
        all_gt, all_est = [], []
        for it, idx in enumerate(loader.iter_index_batches()):
            n_real = len(idx)
            if data is None:
                raw = ds.gather(idx)
                batch = self._put_batch(raw)
                metrics, denoised = self._jit_eval(
                    self.state.params, self._step_key(epoch, it), batch
                )
                gt = raw[1]
            else:
                fed = jax.device_put(self._pad_idx(idx),
                                     self._batch_sharding)
                metrics, denoised = self._jit_eval_dev(
                    self.state.params, self._step_key(epoch, it), data,
                    fed[0], fed[1],
                )
                gt = ds.gather_joints(idx)
            avg.append(metrics)
            # Strip any DP padding rows from the persisted result arrays;
            # gt comes from the host memmap (no device download).
            all_gt.append(gt[:n_real, 0])
            all_est.append(np.asarray(denoised)[:n_real])
            if dump_images and it % 100 == 0:
                host_dms = raw[0] if data is None else ds.gather_dms(idx)
                dms = host_dms[:, 0] * _C.depth_scale
                img = viz.result_grid(
                    dms,
                    np.zeros((dms.shape[0], 41, 16, 16), np.float32),
                    np.asarray(denoised),
                    vis_indices=None,
                )
                viz.save_image(
                    os.path.join(self.image_dir, f"Eval_{epoch}_{it}.jpg"), img
                )
        result = avg.to_dict()
        self._log(f"[eval epoch {epoch}]: {avg}")
        self._log_metrics({"epoch": epoch, "mode": "eval", **result})
        # Result file for the offline evaluator (evaluation/offline.py). The
        # reference's evaluation.py consumed a result.pkl no code wrote
        # anymore (SURVEY.md §2.6); this closes that loop.
        np.savez_compressed(
            os.path.join(self.model_path, "result.npz"),
            gt=np.concatenate(all_gt),
            est=np.concatenate(all_est),
        )
        return result

    # ------------------------------------------------------------ public API
    def train(self) -> None:
        cfg = self.cfg
        for epoch in range(self.starting_epoch, cfg.epoch):
            if cfg.with_real and cfg.synthesize:
                self._epoch_combined(epoch)
            elif cfg.synthesize:
                self._epoch_synt(epoch)
            elif cfg.with_real:
                self._epoch_real_train(epoch)
            self.save_checkpoint(-1)
            self.save_checkpoint(epoch)

    def eval(self) -> dict:
        return self._epoch_real_eval(0, dump_images=True)
