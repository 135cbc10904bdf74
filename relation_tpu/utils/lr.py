"""Learning-rate schedule: constant warmup then multi-step decay.

Mirrors WarmupMultiFactorScheduler (reference lib/utils/lr_scheduler.py:11-66):
lr = warmup_lr for the first warmup_step updates, then base_lr * factor^k where k is
the number of step boundaries passed.
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_multi_factor_schedule(base_lr: float, steps, factor: float = 0.1,
                                 warmup: bool = False, warmup_lr: float = 0.0,
                                 warmup_step: int = 0):
    steps = jnp.asarray(sorted(steps), dtype=jnp.int32) if len(steps) else None

    def schedule(count):
        count = jnp.asarray(count, dtype=jnp.int32)
        if steps is None:
            lr = base_lr
        else:
            k = jnp.sum((count >= steps).astype(jnp.int32))
            lr = base_lr * (factor ** k)
        if warmup and warmup_step > 0:
            lr = jnp.where(count < warmup_step, warmup_lr, lr)
        return lr

    return schedule
