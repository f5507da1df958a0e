"""Training schedules (cf. `Utils/training_utils.py:9-30`).

Both schedules are staircase functions of samples-seen = step * batch_size:
  lr(step)       = init_lr * decay_rate ^ floor(step * B / decay_step)
  bn_mom(step)   = max(0.5 * 0.5 ^ floor(step * B / bn_decay_step), 0.01)

They are written on traced step counters so one compiled train step serves
the whole run (the reference re-assigns optimizer.lr / module.momentum from
Python each iteration).
"""

from __future__ import annotations

import jax.numpy as jnp

BN_INIT_DECAY = 0.5
BN_DECAY_RATE = 0.5
BN_DECAY_CLIP = 0.99


def staircase_learning_rate(
    init_learning_rate: float,
    batch_size: int,
    decay_step: int,
    decay_rate: float,
    staircase: bool = True,
):
    """Returns schedule fn: step -> lr (usable as an optax schedule)."""

    def schedule(step):
        p = step * batch_size / decay_step
        if staircase:
            p = jnp.floor(p)
        return init_learning_rate * decay_rate**p

    return schedule


def batch_norm_momentum(
    batch_size: int, bn_decay_step: int, staircase: bool = True
):
    """Returns schedule fn: step -> BN momentum (clipped at 1 - 0.99)."""

    def schedule(step):
        p = step * batch_size / bn_decay_step
        if staircase:
            p = jnp.floor(p)
        return jnp.maximum(BN_INIT_DECAY * BN_DECAY_RATE**p, 1 - BN_DECAY_CLIP)

    return schedule
