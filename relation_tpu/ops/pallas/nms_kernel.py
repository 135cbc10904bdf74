"""Pallas TPU kernel: exact greedy NMS in one kernel launch.

The XLA formulation (ops/nms.py) runs a lax.while_loop over score-sorted blocks
with an inner convergence while_loop — tens of sequential HLO loop iterations,
each paying loop bookkeeping and HBM round trips for the IoU intermediates.
This kernel does the whole sweep in one pallas_call: boxes live in VMEM
([4, N] planar — an [N, 4] array would lane-pad 4->128), the keep mask is a
[1, N] lane vector, and the greedy recurrence runs as register-resident
matmul/reduce steps.

Algorithm (identical semantics to ops/nms.py::greedy_nms_mask, which mirrors
the reference lib/nms/nms.py:45-83 and the CUDA bitmask kernel
lib/nms/nms_kernel.cu:34-78):
  per score-sorted block of T boxes:
    1. sup[t, j]   = IoU(block_t, box_j) > thresh      (one [T, N] VPU pass,
                     divide-free: inter > t * union)
    2. sup_prev[t] = any_j(sup & kept_j & j < lo)      (lane reduce -> [T, 1])
    3. intra-block greedy fixpoint on the [T, T] tile:
         active = seed & ~(active @ supU > 0)          (MXU, stays [1, T])
    4. write keep[lo:lo+T]; early-exit the block sweep once >= max_keep kept.

Inputs are pre-sorted (descending score) by the wrapper in ops/nms.py; invalid
(padded) boxes carry valid=0 so they are never kept and never suppress.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(bT_ref, valid_ref, keep_ref, *, n, block, thresh, max_keep):
    T = block
    nblk = n // T
    x1 = bT_ref[0, 0:1, :]                                  # [1, N]
    y1 = bT_ref[0, 1:2, :]
    x2 = bT_ref[0, 2:3, :]
    y2 = bT_ref[0, 3:4, :]
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)                # [1, N] (+1 convention)
    valid = valid_ref[0]                                    # [1, N]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    keep_ref[0] = jnp.zeros((1, n), jnp.float32)

    def body(state):
        b, kept = state
        lo = b * T
        # block boxes as [1, T] rows and [T, 1] columns
        rx1 = bT_ref[0, 0:1, pl.ds(lo, T)]                  # [1, T]
        ry1 = bT_ref[0, 1:2, pl.ds(lo, T)]
        rx2 = bT_ref[0, 2:3, pl.ds(lo, T)]
        ry2 = bT_ref[0, 3:4, pl.ds(lo, T)]
        bx1 = jnp.transpose(rx1)                            # [T, 1]
        by1 = jnp.transpose(ry1)
        bx2 = jnp.transpose(rx2)
        by2 = jnp.transpose(ry2)
        barea = (bx2 - bx1 + 1.0) * (by2 - by1 + 1.0)

        iw = jnp.maximum(jnp.minimum(bx2, x2) - jnp.maximum(bx1, x1) + 1.0, 0.0)
        ih = jnp.maximum(jnp.minimum(by2, y2) - jnp.maximum(by1, y1) + 1.0, 0.0)
        inter = iw * ih                                     # [T, N]
        union = barea + area - inter
        sup = (inter > thresh * union).astype(jnp.float32)  # [T, N]

        # suppression by earlier kept boxes (strictly before this block)
        keep_row = keep_ref[0, 0:1, :]                         # [1, N]
        prefix = jnp.where(col < lo, keep_row, 0.0)         # [1, N]
        sup_prev = jnp.max(sup * prefix, axis=1, keepdims=True)   # [T, 1]

        bvalid = valid_ref[0, 0:1, pl.ds(lo, T)]            # [1, T]
        seed = bvalid * (1.0 - jnp.transpose(sup_prev))     # [1, T]

        # intra-block fixpoint: i suppresses j iff i < j, both in this block.
        # The [T, T] tile is recomputed from block coords (Mosaic cannot
        # dynamic-slice a computed value, and the recompute is ~T/N of the
        # [T, N] pass anyway).
        iw2 = jnp.maximum(jnp.minimum(bx2, rx2) - jnp.maximum(bx1, rx1) + 1.0,
                          0.0)                              # [T, T]
        ih2 = jnp.maximum(jnp.minimum(by2, ry2) - jnp.maximum(by1, ry1) + 1.0,
                          0.0)
        inter2 = iw2 * ih2
        rarea = jnp.transpose(barea)                        # [1, T]
        sub = (inter2 > thresh * (barea + rarea - inter2)).astype(jnp.float32)
        row_i = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        subU = jnp.where(row_i < col_i, sub, 0.0)           # [T, T]

        def fix_cond(s):
            active, prev, it = s
            return (it < T) & (jnp.sum(jnp.abs(active - prev)) > 0)

        def fix_body(s):
            active, _, it = s
            hit = jax.lax.dot_general(
                active, subU, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # [1, T]
            return seed * (1.0 - (hit > 0).astype(jnp.float32)), active, it + 1

        active, _, _ = jax.lax.while_loop(
            fix_cond, fix_body, (seed, 1.0 - seed, jnp.int32(0)))

        keep_ref[0, 0:1, pl.ds(lo, T)] = active
        return b + 1, kept + jnp.sum(active).astype(jnp.int32)

    def cond(state):
        b, kept = state
        return (b < nblk) & (kept < max_keep)

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))


@functools.partial(jax.jit,
                   static_argnames=("thresh", "block", "max_keep", "interpret"))
def nms_keep_sorted(boxesT: jnp.ndarray, valid: jnp.ndarray, *, thresh: float,
                    block: int = 256, max_keep: int | None = None,
                    interpret: bool = False) -> jnp.ndarray:
    """Batched greedy-NMS keep mask over score-sorted boxes.

    boxesT: [C, 4, N] f32, each class sorted by descending score, N a multiple
    of ``block``; valid: [C, N] f32 (0 for padded boxes). Returns keep
    [C, N] f32 in sorted order. ``max_keep`` stops the sweep once that many
    boxes are kept (exact for the top-max_keep kept set; later blocks are 0).
    """
    C, _, N = boxesT.shape
    if N % block:
        raise ValueError(f"N={N} must be a multiple of block={block}")
    cap = int(max_keep) if max_keep is not None else N
    kernel = functools.partial(_nms_kernel, n=N, block=block,
                               thresh=float(thresh), max_keep=cap)
    return pl.pallas_call(
        kernel,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, 4, N), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, N), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, 1, N), jnp.float32),
        interpret=interpret,
    )(boxesT, valid.reshape(C, 1, N))[:, 0, :]
