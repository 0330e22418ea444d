"""On-device synthetic pose-parameter sampler (jax.random, fully batched).

Re-design of the reference's ``dataset/joint_angle.py`` (JointAngleDataset
:7-236): the torch version draws one 26-vector at a time on the CPU through a
DataLoader; here :func:`sample_poses` draws a whole batch on the accelerator
inside the jitted train step — branchless, by materializing every grasp
archetype and gathering with the sampled mode indices.

Distribution parity (same ranges/couplings, same archetype mixture):
- palm: yaw/roll in [-pi, pi], pitch in [-pi, 0], translation xy +-15 mm,
  z in [-35, 15] (joint_angle.py:22-29);
- coupled abduction: shared spread (U-0.35)/1.55 scaled per finger by
  [1.55, 0.75, -0.75, -2.2] plus +-5 deg jitter (:32-40);
- five per-finger flex archetypes (straight/open/half-open/pinching/closed)
  with inter-phalange coupling (:42-116);
- 10 hand modes mixing archetypes per finger (:160-214; the second
  ``mode == 8`` branch there is unreachable and therefore not reproduced);
- thumb: bimodal flex, flex2 = 0.25 flex1, flex3 in [-1.7, 0.3] (:118-129).
"""
from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

_DEG = math.pi / 180.0

# Per-finger abduction coupling coefficients: index, middle, ring, pinky
# (joint_angle.py:36-39).
_ABDUCT_COEF = np.asarray([1.55, 0.75, -0.75, -2.2], np.float32)


def _u(key, shape, lo, hi):
    return jax.random.uniform(key, shape, jnp.float32, lo, hi)


def _flex_archetypes(key: jax.Array, shape: tuple) -> jnp.ndarray:
    """All five flex archetypes for every (batch, finger) slot.

    Returns (*shape, 5, 3): [straight, open, half-open, pinching, closed]
    flex triples (joint_angle.py:42-116).
    """
    ks = jax.random.split(key, 8)
    base = jnp.asarray([-0.2, -0.4, -0.34], jnp.float32)

    # Three coupled stages shared by the bent archetypes: stage k draws a
    # flex angle and spreads it over the phalanges with fixed couplings.
    couple = jnp.asarray(
        [[1.0, 0.2, 0.0], [0.2, 1.0, 0.7], [0.0, 0.2, 1.0]], jnp.float32
    )  # (stage, phalange)
    pert = _u(ks[0], shape + (3,), -10 * _DEG, 10 * _DEG)
    big = _u(ks[1], shape + (3,), 60 * _DEG, 90 * _DEG) + pert  # closed stages
    small_tail = _u(ks[2], shape + (2,), 5 * _DEG, 35 * _DEG) + pert[..., 1:]
    half_head = _u(ks[3], shape, 0.0, 30 * _DEG) + pert[..., 0]

    def mix(stages):  # (..., 3 stages) -> (..., 3 phalanges)
        return base + jnp.einsum("...s,sp->...p", stages, couple)

    closed = mix(big)
    pinching = mix(jnp.concatenate([big[..., :1], small_tail], axis=-1))
    half_open = mix(jnp.concatenate([half_head[..., None], big[..., 1:]], axis=-1))
    straight = jnp.stack(
        [
            _u(ks[4], shape, -0.25, 0.0),
            _u(ks[5], shape, -0.4, 0.0),
            _u(ks[6], shape, -0.34, 0.0),
        ],
        axis=-1,
    )
    k8, k9, k10 = jax.random.split(ks[7], 3)
    open_ = jnp.stack(
        [
            _u(k8, shape, -0.1, 0.15),
            _u(k9, shape, -0.1, 0.3),
            _u(k10, shape, -0.1, 0.24),
        ],
        axis=-1,
    )
    return jnp.stack([straight, open_, half_open, pinching, closed], axis=-2)


def sample_poses(key: jax.Array, batch: int) -> jnp.ndarray:
    """Draw a batch of 26-dim pose parameter vectors. Returns (batch, 26)."""
    keys = jax.random.split(key, 10)

    # Palm 6-DoF (joint_angle.py:22-29).
    palm = jnp.stack(
        [
            _u(keys[0], (batch,), -3.14, 3.14),
            -_u(keys[1], (batch,), 0.0, 3.14),
            _u(keys[2], (batch,), -3.14, 3.14),
            _u(keys[3], (batch,), -15.0, 15.0),
            _u(keys[4], (batch,), -15.0, 15.0),
            _u(keys[5], (batch,), -35.0, 15.0),
        ],
        axis=-1,
    )

    # Coupled abduction (joint_angle.py:32-40).
    spread = (jax.random.uniform(keys[6], (batch, 1)) - 0.35) / 1.55
    jitter = _u(keys[7], (batch, 4), -5 * _DEG, 5 * _DEG)
    abduct = jnp.asarray(_ABDUCT_COEF) * (spread + jitter)

    # Finger flex: all archetypes, then mode-based per-finger gather
    # (joint_angle.py:160-214).
    k_arch, k_mode, k_open, k_close, k_any, k_thumb = jax.random.split(keys[8], 6)
    arch = _flex_archetypes(k_arch, (batch, 4))  # (B, 4, 5, 3)
    mode = jax.random.randint(k_mode, (batch,), 0, 10)
    open_pick = jax.random.randint(k_open, (batch, 4), 0, 3)  # straight/open/half
    close_pick = jax.random.randint(k_close, (batch, 4), 3, 5)  # pinch/closed
    any_pick = jax.random.randint(k_any, (batch, 4), 0, 5)

    # Per-mode, per-finger archetype selector. Codes: 0-4 = fixed archetype,
    # 5 = random-open, 6 = random-close, 7 = random-any.
    mode_table = jnp.asarray(
        [
            [0, 0, 0, 0],  # all straight
            [1, 1, 1, 1],  # all open
            [2, 2, 2, 2],  # all half-open
            [3, 3, 3, 3],  # all pinching
            [4, 4, 4, 4],  # all closed
            [5, 6, 6, 6],  # index open
            [6, 6, 6, 5],  # pinky open
            [5, 5, 6, 6],  # index & middle open
            [6, 5, 5, 5],  # middle & ring & pinky open
            [7, 7, 7, 7],  # fully random
        ],
        jnp.int32,
    )
    code = mode_table[mode]  # (B, 4)
    pick = jnp.where(
        code < 5, code, jnp.where(code == 5, open_pick, jnp.where(code == 6, close_pick, any_pick))
    )
    flex = jnp.take_along_axis(arch, pick[..., None, None], axis=-2)[..., 0, :]  # (B,4,3)

    fingers = jnp.concatenate([abduct[..., None], flex], axis=-1)  # (B, 4, 4)

    # Thumb (joint_angle.py:118-129).
    kt = jax.random.split(k_thumb, 4)
    bent = jax.random.uniform(kt[0], (batch,)) < 0.5
    t_flex = jnp.where(
        bent, _u(kt[1], (batch,), -0.25, 0.10), _u(kt[1], (batch,), 0.1, 0.7)
    )
    thumb = jnp.stack(
        [
            _u(kt[2], (batch,), -0.5, 0.5),
            t_flex,
            0.25 * t_flex,
            _u(kt[3], (batch,), -1.7, 0.3),
        ],
        axis=-1,
    )

    # Parameter layout (joint_angle.py:8-16,216-231): palm, then fingers at
    # offsets INDEX=6, MIDDLE=10, RING=14, PINKY=18, THUMB=22.
    return jnp.concatenate(
        [palm, fingers.reshape(batch, 16), thumb], axis=-1
    )
