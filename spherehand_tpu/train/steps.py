"""Jitted train/eval steps — the whole iteration is ONE XLA program.

The reference's hot loop (network/engine.py:318-436) interleaves host-side
DataLoader pulls, per-module CUDA launches, and per-iteration ``.cpu()``
metric syncs. Here synthesis (pose sampling -> FK -> rasterization -> noise),
the network forward, every loss, the backward pass, and the optimizer update
compile into a single donated-buffer jit; real-data batches are the only
host input, and metrics come back as device scalars the engine reads lazily.

Optimizer parity: Adam(lr, weight_decay=1e-5) with torch semantics — the L2
term is added to the gradient BEFORE the moment updates
(``optax.add_decayed_weights`` ahead of ``scale_by_adam``), matching
engine.py:95-97. The learning rate enters the step as a scalar argument so
the engine can drive the reference's StepLR schedule per epoch.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from spherehand_tpu.constants import Constants
from spherehand_tpu.data.noise import depth_resample
from spherehand_tpu.data.sampler import sample_poses
from spherehand_tpu.data.synthesizer import synthesize
from spherehand_tpu.evaluation.metrics import average_joint_error
from spherehand_tpu.hand.assets import HandModel
from spherehand_tpu.losses.multitask import combine_loss, multitask_loss
from spherehand_tpu.models.estimator import forward, make_network
from spherehand_tpu.models.pose_denoiser import load_pose_denoiser
from spherehand_tpu.models.pose_vae import load_pose_vae_params
from spherehand_tpu.train.config import EngineConfig

_C = Constants()


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    # Carried state for the temporal-smoothness loss (util_modules.py:360-381).
    prev_skel: jnp.ndarray  # (V, 41, 3)
    has_prev: jnp.ndarray   # bool scalar


class StepFns(NamedTuple):
    init_state: Any          # (key) -> TrainState
    synt_step: Any           # (state, key, lr) -> (state, metrics)
    combined_step: Any       # (state, key, lr, batch, is_mv) -> (state, metrics, vis)
    combined_grads: Any      # (state, key, batch, is_mv) -> (loss, grads)
    combined_term_diag: Any  # (state, key, batch, is_mv) -> flat diag dict
    real_step: Any           # (state, key, lr, batch) -> (state, metrics, vis)
    eval_step: Any           # (params, key, batch) -> metrics dict
    network: Any


class RealBatch(NamedTuple):
    """One NYU multi-view batch (depth in mm, straight from the loader).

    ``weights`` is None for an unpadded batch, else a (B,) vector with 0.0
    marking rows the engine duplicated in to make B divide the device mesh
    (zero loss, zero gradient — see spherehand_tpu.ops.reduce)."""

    dms: jnp.ndarray         # (B, V, 64, 64) mm, background 100
    gt_joints: jnp.ndarray   # (B, V, 36, 3)
    poses: jnp.ndarray       # (B, V, 4, 4)
    inv_poses: jnp.ndarray   # (B, V, 4, 4)
    weights: jnp.ndarray | None = None  # (B,) row weights (1 real, 0 pad)


def make_optimizer(weight_decay: float = 1e-5) -> optax.GradientTransformation:
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(),
    )


def build_steps(
    cfg: EngineConfig,
    hand: HandModel,
    synt_pad: int = 0,
    data_sharding=None,
) -> StepFns:
    """Construct the jitted step functions, closed over static config/assets.

    synt_pad: extra synthetic rows generated per step so the on-device batch
    divides the data-parallel mesh; they carry weight 0 in every synthetic
    loss term (exact single-device objective at any device count).
    data_sharding: optional NamedSharding pinning on-device-generated
    synthetic data to the batch axis — without it a synthetic-only step has
    no sharded inputs and XLA may keep the whole batch on one device.
    """
    network = make_network(
        cfg.num_stacks, dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32
    )
    # Eval-time network: same params, optionally true-f32 conv passes so the
    # eval metric is independent of batch composition (cfg.eval_precision).
    eval_network = (
        make_network(cfg.num_stacks, dtype=jnp.float32, precision="highest")
        if cfg.eval_precision == "highest"
        else network
    )
    loss_cfg = cfg.loss_config
    tx = make_optimizer(cfg.weight_decay)
    vae_params = load_pose_vae_params() if cfg.prior else None
    denoiser, denoiser_params = load_pose_denoiser()
    radii = hand.kp_radius
    synt_total = cfg.synt_batch + synt_pad

    def _synt_weights():
        if synt_pad == 0:
            return None
        return jnp.concatenate(
            [jnp.ones(cfg.synt_batch), jnp.zeros(synt_pad)]
        )

    def _shard_synt(synt):
        if data_sharding is None:
            return synt
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, data_sharding), synt
        )

    def init_state(key: jax.Array) -> TrainState:
        params = network.init(key, jnp.zeros((1, 64, 64)))["params"]
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            prev_skel=jnp.zeros((3, _C.num_joints, 3)),
            has_prev=jnp.zeros((), bool),
        )

    def _apply_updates(state, grads, lr, prev_skel, has_prev):
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(
            state.params, jax.tree.map(lambda u: -lr * u, updates)
        )
        return state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            prev_skel=prev_skel,
            has_prev=has_prev,
        )

    def _maybe_resample(key, dms):
        if cfg.depth_resample:
            return depth_resample(key, dms, 0.95, cfg.depth_resample)
        return dms

    def synt_step(state: TrainState, key: jax.Array, lr: jnp.ndarray):
        """Synthetic-only pretraining step (engine.py:265-316)."""
        k_pose, k_synt, k_rs = jax.random.split(key, 3)
        pose_params = sample_poses(k_pose, synt_total)
        synt = _shard_synt(synthesize(hand, k_synt, pose_params))
        synt = synt._replace(dms=_maybe_resample(k_rs, synt.dms))
        synt_w = _synt_weights()

        def loss_fn(params):
            out = forward(network, params, synt_dms=synt.dms)
            terms, _, _ = multitask_loss(
                loss_cfg, out, radii, synt_target=synt, synt_weights=synt_w
            )
            return combine_loss(terms), (terms, out)

        (loss, (terms, out)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = _apply_updates(state, grads, lr, state.prev_skel, state.has_prev)
        metrics = {"loss": loss, **terms}
        from spherehand_tpu.ops.reduce import bmean

        metrics["synt_joint_err"] = bmean(
            jnp.linalg.norm(out.synt_xyz[-1] - synt.xyz, axis=-1), synt_w
        )
        return state, metrics

    def _combined_grads(
        state: TrainState,
        key: jax.Array,
        batch: RealBatch,
        is_mv: jnp.ndarray,
        real_aug: bool = True,
    ):
        """Loss + pre-optimizer gradients of the combined objective — the
        shared core of combined_step, also exposed as StepFns.combined_grads
        so the data-parallel equivalence tests can compare raw gradients
        (post-Adam params amplify float-level psum noise through the
        sign-like first-step update)."""
        k_pose, k_synt, k_rs, k_aug, k_prior = jax.random.split(key, 5)
        pose_params = sample_poses(k_pose, synt_total)
        synt = _shard_synt(synthesize(hand, k_synt, pose_params))
        synt_w = _synt_weights()

        scaled_real = batch.dms * _C.depth_scale
        if cfg.depth_resample:
            k_rs2, k_rs = jax.random.split(k_rs)
            flat = scaled_real.reshape(-1, 64, 64)
            scaled_real = depth_resample(
                k_rs2, flat, 0.95, cfg.depth_resample
            ).reshape(scaled_real.shape)
            synt = synt._replace(dms=_maybe_resample(k_rs, synt.dms))

        real_target = {
            "real_dms": batch.dms,
            "camera_poses": batch.poses,
            "inv_camera_poses": batch.inv_poses,
        }

        def loss_fn(params):
            out = forward(
                network,
                params,
                synt_dms=synt.dms,
                real_dms=scaled_real,
                rng=k_aug,
                train=True,
                real_aug=real_aug,
            )
            terms, _, new_prev = multitask_loss(
                loss_cfg,
                out,
                radii,
                vae_params=vae_params,
                synt_target=synt,
                real_target=real_target,
                rng=k_prior,
                is_mv=is_mv,
                prev_skel=state.prev_skel,
                has_prev=state.has_prev,
                real_weights=batch.weights,
                synt_weights=synt_w,
            )
            return combine_loss(terms), (terms, out, new_prev)

        (loss, (terms, out, new_prev)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        return loss, terms, out, new_prev, grads, synt, scaled_real

    def combined_grads(
        state: TrainState, key: jax.Array, batch: RealBatch,
        is_mv: jnp.ndarray, real_aug: bool = True,
    ):
        """(loss, grads) of the combined objective — no optimizer update.

        real_aug=False bypasses the resize-crop augmentation: its per-row
        scale draws are jax.random calls whose COUNT is the (possibly padded)
        flat batch size, and threefry pairs counters (i, i + n/2), so the
        same real row draws different randomness at different paddings —
        padding-equivalence tests must compare the deterministic objective.
        """
        loss, _, _, _, grads, _, _ = _combined_grads(
            state, key, batch, is_mv, real_aug=real_aug
        )
        return loss, grads

    def combined_term_diag(
        state: TrainState, key: jax.Array, batch: RealBatch,
        is_mv: jnp.ndarray,
    ) -> dict:
        """Per-term gradient attribution of the combined objective.

        One forward + one ``jax.vjp``; each loss term's parameter gradient is
        then a single backward pass with a one-hot cotangent over the terms
        dict, so T terms cost T backwards off a shared forward. Returns a
        flat dict of scalars per term: ``<term>/value`` (unweighted-sum loss
        value as logged), ``<term>/grad_norm`` (global L2 norm of that term's
        parameter gradient alone) and ``<term>/cos_total`` (cosine between
        the term's gradient and the total gradient — negative means the term
        fights the net update direction), plus ``total_grad_norm``,
        ``update_norm`` (the Adam step direction's global norm at the current
        optimizer state; the applied step is lr x this) and ``param_norm``.

        Built for the stock-recipe divergence study (PERF.md round 5): the
        reference's hot loop (network/engine.py:318-436) never attributes its
        gradient, so when its stock lr diverges on a shifted domain nothing
        says which of the 9 terms is responsible. This does.
        """
        k_pose, k_synt, k_rs, k_aug, k_prior = jax.random.split(key, 5)
        pose_params = sample_poses(k_pose, synt_total)
        synt = _shard_synt(synthesize(hand, k_synt, pose_params))
        synt_w = _synt_weights()
        scaled_real = batch.dms * _C.depth_scale
        if cfg.depth_resample:
            k_rs2, k_rs = jax.random.split(k_rs)
            flat = scaled_real.reshape(-1, 64, 64)
            scaled_real = depth_resample(
                k_rs2, flat, 0.95, cfg.depth_resample
            ).reshape(scaled_real.shape)
            synt = synt._replace(dms=_maybe_resample(k_rs, synt.dms))
        real_target = {
            "real_dms": batch.dms,
            "camera_poses": batch.poses,
            "inv_camera_poses": batch.inv_poses,
        }

        def terms_fn(params):
            out = forward(
                network, params, synt_dms=synt.dms, real_dms=scaled_real,
                rng=k_aug, train=True,
            )
            terms, _, _ = multitask_loss(
                loss_cfg, out, radii, vae_params=vae_params,
                synt_target=synt, real_target=real_target, rng=k_prior,
                is_mv=is_mv, prev_skel=state.prev_skel,
                has_prev=state.has_prev, real_weights=batch.weights,
                synt_weights=synt_w,
            )
            return terms

        terms, vjp_fn = jax.vjp(terms_fn, state.params)
        names = sorted(terms)

        def flat(tree):
            return jnp.concatenate(
                [jnp.ravel(x).astype(jnp.float32) for x in jax.tree.leaves(tree)]
            )

        term_grads = {}
        for name in names:
            cot = {
                n: jnp.asarray(1.0 if n == name else 0.0, terms[n].dtype)
                for n in names
            }
            (g,) = vjp_fn(cot)
            term_grads[name] = flat(g)
        total = sum(term_grads.values())
        total_norm = jnp.linalg.norm(total)
        diag = {"total_grad_norm": total_norm}
        for name in names:
            g = term_grads[name]
            n = jnp.linalg.norm(g)
            diag[f"{name}/value"] = terms[name]
            diag[f"{name}/grad_norm"] = n
            diag[f"{name}/cos_total"] = jnp.dot(g, total) / (
                n * total_norm + 1e-30
            )
        # Adam direction at the current optimizer state: rebuild the total
        # gradient as a pytree with one more backward (all-ones cotangent).
        (tg,) = vjp_fn({n: jnp.asarray(1.0, terms[n].dtype) for n in names})
        updates, _ = tx.update(tg, state.opt_state, state.params)
        diag["update_norm"] = optax.global_norm(updates)
        diag["param_norm"] = optax.global_norm(state.params)
        return diag

    def combined_step(
        state: TrainState,
        key: jax.Array,
        lr: jnp.ndarray,
        batch: RealBatch,
        is_mv: jnp.ndarray,
    ):
        """Mixed synthetic + real self-supervised step (engine.py:318-436)."""
        loss, terms, out, new_prev, grads, synt, scaled_real = _combined_grads(
            state, key, batch, is_mv
        )
        prev_skel, has_prev = new_prev
        if prev_skel is None:
            prev_skel, has_prev = state.prev_skel, state.has_prev
        state = _apply_updates(state, grads, lr, prev_skel, has_prev)
        metrics = {"loss": loss, **terms}
        metrics["avg_joint_error"] = average_joint_error(
            batch.gt_joints, out.real_xyz[-1], weights=batch.weights
        )
        # Visualization payload (final stack). Device arrays; the engine only
        # materializes them at its image-dump cadence (engine.py:386-434).
        vis = {
            "real_dms": scaled_real,
            "real_uv_hms": out.real_uv_hms[-1],
            "real_xyz": out.real_xyz[-1],
            "synt_dms": synt.dms,
            "synt_uv_hms": out.synt_uv_hms[-1],
            "synt_xyz": out.synt_xyz[-1],
            "synt_gt_uv_hms": synt.uv_hms,
            "synt_gt_xyz": synt.xyz,
        }
        return state, metrics, vis

    def real_step(
        state: TrainState, key: jax.Array, lr: jnp.ndarray, batch: RealBatch
    ):
        """Real-data-only self-supervised step (engine.py:150-263, Train mode)."""
        k_rs, k_aug, k_prior = jax.random.split(key, 3)
        scaled_real = batch.dms * _C.depth_scale
        if cfg.depth_resample:
            flat = scaled_real.reshape(-1, 64, 64)
            scaled_real = depth_resample(
                k_rs, flat, 0.95, cfg.depth_resample
            ).reshape(scaled_real.shape)
        real_target = {
            "real_dms": batch.dms,
            "camera_poses": batch.poses,
            "inv_camera_poses": batch.inv_poses,
        }

        def loss_fn(params):
            out = forward(
                network, params, real_dms=scaled_real, rng=k_aug, train=True
            )
            terms, _, new_prev = multitask_loss(
                loss_cfg,
                out,
                radii,
                vae_params=vae_params,
                real_target=real_target,
                rng=k_prior,
                is_mv=jnp.asarray(True),
                prev_skel=state.prev_skel,
                has_prev=state.has_prev,
                real_weights=batch.weights,
            )
            return combine_loss(terms), (terms, out, new_prev)

        (loss, (terms, out, new_prev)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        prev_skel, has_prev = new_prev
        if prev_skel is None:
            prev_skel, has_prev = state.prev_skel, state.has_prev
        state = _apply_updates(state, grads, lr, prev_skel, has_prev)
        metrics = {"loss": loss, **terms}
        metrics["avg_joint_error"] = average_joint_error(
            batch.gt_joints, out.real_xyz[-1], weights=batch.weights
        )
        # Visualization payload: the reference dumps (dms, uv_hms, xyz) result
        # grids every 100 iterations in real-train mode too (engine.py:229-260).
        vis = {
            "real_dms": scaled_real,
            "real_uv_hms": out.real_uv_hms[-1],
            "real_xyz": out.real_xyz[-1],
        }
        return state, metrics, vis

    def eval_step(params, key: jax.Array, batch: RealBatch):
        """Evaluation step (engine.py:150-263): losses for logging plus the
        headline metric — view 0, last stack, palm joints denoised
        (engine.py:203-207)."""
        scaled_real = batch.dms * _C.depth_scale
        out = forward(eval_network, params, real_dms=scaled_real, train=False)
        real_target = {
            "real_dms": batch.dms,
            "camera_poses": batch.poses,
            "inv_camera_poses": batch.inv_poses,
        }
        terms, _, _ = multitask_loss(
            loss_cfg,
            out,
            radii,
            vae_params=vae_params,
            real_target=real_target,
            rng=key,
            is_mv=jnp.asarray(True),
            real_weights=batch.weights,
        )
        est = out.real_xyz[-1][:, 0]  # (B, 41, 3), view 0
        denoised = denoiser.apply({"params": denoiser_params}, est)
        metrics = {**terms}
        metrics["avg_joint_error"] = average_joint_error(
            batch.gt_joints[:, 0], denoised, weights=batch.weights
        )
        metrics["avg_joint_error_raw"] = average_joint_error(
            batch.gt_joints[:, 0], est, weights=batch.weights
        )
        return metrics, denoised

    return StepFns(
        init_state=init_state,
        synt_step=synt_step,
        combined_step=combined_step,
        combined_grads=combined_grads,
        combined_term_diag=combined_term_diag,
        real_step=real_step,
        eval_step=eval_step,
        network=network,
    )
