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
    through untouched).

    NOTE: jax.debug.print rides host send/recv callbacks, which the axon PJRT
    tunnel rejects — on the TPU, use :func:`tensor_stats` taps fetched as
    program OUTPUTS instead (core/predictor.make_predict_fn DEBUG_MONITOR)."""
    if stats:
        jax.debug.print(
            "[monitor] {n} shape={s} min={mn:.5f} max={mx:.5f} mean={me:.5f}",
            n=nickname, s=str(x.shape), mn=jnp.min(x).astype(jnp.float32),
            mx=jnp.max(x).astype(jnp.float32),
            me=jnp.mean(x.astype(jnp.float32)))
    else:
        jax.debug.print("[monitor] {n} shape={s}", n=nickname, s=str(x.shape))
    return x


def tensor_stats(x: jnp.ndarray) -> jnp.ndarray:
    """[min, max, mean] of ``x`` as one f32 triple — the monitor tap in
    fetchable-output form for backends without host callbacks (the axon PJRT
    tunnel rejects debug.print/io_callback send/recv; reference
    operator_py/monitor_op.py prints the same summary host-side)."""
    xf = x.astype(jnp.float32)
    return jnp.stack([jnp.min(xf), jnp.max(xf), jnp.mean(xf)])
