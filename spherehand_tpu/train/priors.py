"""Offline trainers for the frozen prior networks (VAE, denoiser) and the
PCA pose prior builder.

Re-designs of the reference's embedded training drivers:
- ``network/pose_vae.py:140-189``  (train PoseVae on FK skeletons / 100)
- ``network/pose_denoiser.py:98-150`` (train PoseDenoiser on noisy skeletons)
- ``mesh/pose_prior.py:42-76``     (PCA over 1.2M sampled skeletons)

All three consume the on-device synthetic pose sampler + skeleton FK, so an
entire "epoch" is a jit-compiled scan of steps — no DataLoader processes.
"""
from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
import optax

from spherehand_tpu.data.sampler import sample_poses
from spherehand_tpu.hand.assets import HandModel
from spherehand_tpu.hand.skeleton import skeleton_fk
from spherehand_tpu.models.pose_denoiser import PoseDenoiser, denoiser_loss
from spherehand_tpu.models.pose_vae import PoseVae


def train_pose_vae(
    hand: HandModel,
    steps: int = 15_000,
    batch: int = 128,
    lr: float = 1e-3,
    seed: int = 0,
    log_every: int = 1000,
) -> dict:
    """Train the pose VAE on synthetic skeletons (joints / 100).

    Returns flax params compatible with :mod:`spherehand_tpu.models.pose_vae`.
    """
    vae = PoseVae()
    key = jax.random.key(seed)
    params = vae.init(
        jax.random.key(seed + 1), jnp.zeros((1, 123)), rng=jax.random.key(0)
    )["params"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        k_pose, k_rep = jax.random.split(key)
        poses = sample_poses(k_pose, batch)
        joints = skeleton_fk(hand, poses) / 100.0
        x = joints.reshape(batch, -1)

        def loss_fn(p):
            _, _, _, likelihood = vae.apply(
                {"params": p}, x, rng=k_rep, reparameterize=True
            )
            return likelihood

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        if i % log_every == 0:
            print(f"[vae {i}] loss {float(loss):.5f}")
    return params

def train_pose_denoiser(
    hand: HandModel,
    steps: int = 15_000,
    batch: int = 128,
    lr: float = 1e-3,
    seed: int = 0,
    log_every: int = 1000,
) -> dict:
    """Train the palm denoiser: noisy skeleton in, clean palm out."""
    denoiser = PoseDenoiser()
    key = jax.random.key(seed)
    params = denoiser.init(
        jax.random.key(seed + 1),
        jnp.zeros((1, 41, 3)),
        rng=jax.random.key(0),
        train=True,
    )["params"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        k_pose, k_noise = jax.random.split(key)
        joints = skeleton_fk(hand, sample_poses(k_pose, batch))

        def loss_fn(p):
            denoised = denoiser.apply(
                {"params": p}, joints, rng=k_noise, train=True
            )
            return denoiser_loss(joints, denoised)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        if i % log_every == 0:
            print(f"[denoiser {i}] loss {float(loss):.5f}")
    return params


def build_pca_prior(
    hand: HandModel,
    num_samples: int = 1_200_000,
    num_components: int = 30,
    batch: int = 4096,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """PCA over root-centered synthetic skeletons (mesh/pose_prior.py:42-76).

    Computed exactly (covariance eigendecomposition over streamed batches)
    instead of sklearn's fit over a 1.2M-row matrix. Returns
    (mean (123,), components (num_components, 123)).
    """
    fk = jax.jit(partial(skeleton_fk, hand))

    @jax.jit
    def batch_stats(key):
        joints = fk(sample_poses(key, batch))
        centered = joints - joints[:, 0:1]
        flat = centered.reshape(batch, -1)
        return flat.sum(0), flat.T @ flat

    dim = 41 * 3
    total = np.zeros(dim)
    outer = np.zeros((dim, dim))
    n_batches = num_samples // batch
    for i in range(n_batches):
        s, o = batch_stats(jax.random.fold_in(jax.random.key(seed), i))
        total += np.asarray(s, np.float64)
        outer += np.asarray(o, np.float64)
    n = n_batches * batch
    mean = total / n
    cov = outer / n - np.outer(mean, mean)
    eigvals, eigvecs = np.linalg.eigh(cov)
    components = eigvecs[:, ::-1][:, :num_components].T  # (K, 123)
    return mean.astype(np.float32), components.astype(np.float32)


def save_flax_params_npz(path: str, params: dict) -> None:
    """Flatten a flax param tree to 'a/b/c' keys in an .npz archive."""
    flat = {}

    def rec(prefix, tree):
        for k, v in tree.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                rec(key, v)
            else:
                flat[key] = np.asarray(v)

    rec("", params)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **flat)
