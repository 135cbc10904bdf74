"""Pallas TPU kernel: deformable_col2im (the dx term of the deformable-conv
backward) as a fused Khatri-Rao matmul.

The math (per batch b and deformable group g):

    dx[p, c] = sum_r  By[r, h(p)] * Bx[r, w(p)] * D[r, c]

with r ranging over every (tap, output-position) sample, By/Bx the separable
bilinear hat rows of the sample against the y/x integer grids (zero-extension
mask folded in), and D the column-gradient rows. The CUDA reference scatters:
one atomic add per (sample, corner) (deformable_col2im_gpu_kernel,
operator_cxx/nn/deformable_im2col.cuh:317-417). The TPU has no scatter
hardware — XLA lowers the 4-corner scatter-add to a serialized row-update
loop measured at 17.5-20.2 ms/img for the 3 res5 convs (r5 legs, flat in B —
the dominant DCN train cost). The dense-matmul alternative materializes
A[r, p] = By[r,:] x Bx[r,:] in HBM (~106 MB per (b, g): the rejected 'hat'
mode).

This kernel builds each A TILE in VMEM only:

    for each r-block:   A_blk[BLK, H*W] = repeat(By_blk, W) * tile(Bx_blk, H)
                        acc[H*W, c]    += A_blk^T @ D_blk        (MXU)

so the full A never exists; HBM traffic is just By + Bx + D + the [H*W, cg]
accumulator, and the FLOPs (2 * R * HW * cg per (b, g)) ride the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 256


def _col2im_kernel(by_ref, bx_ref, d_ref, out_ref):
    """Grid (BG, R/BLK). Blocks: by [1, BLK, H], bx [1, BLK, W],
    d [1, BLK, cg], out [1, H*W, cg] (constant over the r dimension —
    accumulated across the sequential minor grid axis)."""
    rb = pl.program_id(1)

    @pl.when(rb == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    by = by_ref[0]                       # [BLK, H]
    bx = bx_ref[0]                       # [BLK, W]
    H = by.shape[1]
    W = bx.shape[1]
    # A[r, h*W + w] = By[r, h] * Bx[r, w].
    # element-repeat of By along lanes (h-major) via a 0/1 expansion matmul
    # (pltpu.repeat is TILE-wise); the Bx tiling IS pltpu.repeat's semantics.
    lane = jax.lax.broadcasted_iota(jnp.int32, (H, H * W), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (H, H * W), 0)
    expand = (lane // W == row).astype(by.dtype)          # [H, H*W]
    by_exp = jax.lax.dot_general(
        by, expand, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(by.dtype)
    a = by_exp * pltpu.repeat(bx, H, axis=1)
    # acc += A^T @ D  (contraction over the r-block sublanes)
    out_ref[0] += jax.lax.dot_general(
        a, d_ref[0], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("H", "W", "interpret"))
def dconv_col2im(by: jnp.ndarray, bx: jnp.ndarray, d: jnp.ndarray,
                 H: int, W: int, interpret: bool = False) -> jnp.ndarray:
    """by [BG, R, H], bx [BG, R, W], d [BG, R, cg] -> dx [BG, H*W, cg] f32.

    R must be a multiple of the 256-row block (pad with zero hat rows).
    ``interpret``: run the kernel in interpreter mode (CPU parity tests)."""
    BG, R, _ = by.shape
    cg = d.shape[-1]
    assert R % _BLK == 0, R
    grid = (BG, R // _BLK)
    return pl.pallas_call(
        _col2im_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _BLK, H), lambda i, rb: (i, rb, 0)),
            pl.BlockSpec((1, _BLK, W), lambda i, rb: (i, rb, 0)),
            pl.BlockSpec((1, _BLK, cg), lambda i, rb: (i, rb, 0)),
        ],
        out_specs=pl.BlockSpec((1, H * W, cg), lambda i, rb: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((BG, H * W, cg), jnp.float32),
        interpret=interpret,
    )(by, bx, d)


def hat_rows_masked(coords, valid, dim, dtype):
    """[..., dim] bilinear hat rows: max(1 - |coord - p|, 0) * valid —
    identical weights to the 2-corner zero-extension bilinear
    (ops/deform._hat_rows)."""
    g = jnp.arange(dim, dtype=jnp.float32)
    w = jnp.maximum(1.0 - jnp.abs(coords[..., None] - g), 0.0)
    return (w * valid[..., None].astype(jnp.float32)).astype(dtype)
