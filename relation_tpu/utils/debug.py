"""In-graph tensor monitoring (reference operator_py/monitor_op.py equivalent).

The reference's ``monitor`` CustomOp is an identity that nicknames and prints a
tensor mid-graph (monitor_op.py:16-53). Under XLA the same capability is
jax.debug.print-based: ``monitor(x, "name")`` is an identity that logs shape and
summary stats when the compiled program executes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def monitor(x: jnp.ndarray, nickname: str = "tensor",
            stats: bool = True) -> jnp.ndarray:
    """Identity with runtime logging; safe under jit/vmap/grad (gradient passes
    through untouched)."""
    if stats:
        jax.debug.print(
            "[monitor] {n} shape={s} min={mn:.5f} max={mx:.5f} mean={me:.5f}",
            n=nickname, s=str(x.shape), mn=jnp.min(x).astype(jnp.float32),
            mx=jnp.max(x).astype(jnp.float32),
            me=jnp.mean(x.astype(jnp.float32)))
    else:
        jax.debug.print("[monitor] {n} shape={s}", n=nickname, s=str(x.shape))
    return x
