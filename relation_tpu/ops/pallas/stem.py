"""Pallas TPU kernel: fused conv1 stem (s2d im2col + MXU matmul + BN + ReLU).

Input is the space-to-depth planar image [12, Ho, Wo] (see
models/backbone.py::image_to_s2d_planar). The XLA formulation stacks the 16
tap slices into a [192, Ho*Wo] patch matrix in HBM (60 MB bf16 write + read at
608x1024) before the matmul; here the patches are assembled in VMEM per
row-block and HBM sees only the input once (3.7 MB) and the conv1 output once
(~19 MB bf16). BN (folded scale/bias) and ReLU are fused into the epilogue.

Output is planar [64, Ho*Wo]; the caller reshapes to [64, Ho, Wo], max-pools,
and transposes to NHWC (all cheap next to the conv).

Mirrors conv1 7x7/2 + bn_conv1 + relu (reference rcnn_base.py:30-36); the tap
re-indexing is models/backbone.py::conv1_w4.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stem_kernel(x_ref, w_ref, sb_ref, out_ref, *, rows, wo, kc):
    """x_ref: [12, Hp, Wp] (full, padded (2,1)x(2,1)); w_ref: [16*12, 64];
    sb_ref: [2, 64] (bn scale row 0, bias row 1); out block: [64, rows*wo]."""
    p = pl.program_id(0)
    r0 = pl.multiple_of(p * rows, 8)
    # one aligned block load (dynamic sublane starts must be 8-aligned), then
    # static in-register slices for the 16 tap offsets
    blk = x_ref[:, pl.ds(r0, rows + 8), :]                      # [12, R+8, Wp]
    cols = []
    for dh in range(4):
        for dw in range(4):
            sl = blk[:, dh:dh + rows, dw:dw + wo]               # [12, R, Wo]
            cols.append(sl.astype(jnp.bfloat16).reshape(kc, rows * wo))
    patches = jnp.concatenate(cols, axis=0)                     # [192, R*Wo]
    acc = jax.lax.dot_general(
        w_ref[:].astype(jnp.bfloat16), patches,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                     # [64, R*Wo]
    scale = sb_ref[0:1, :]                                      # [1, 64]
    bias = sb_ref[1:2, :]
    y = jnp.maximum(acc * jnp.transpose(scale) + jnp.transpose(bias), 0.0)
    out_ref[:] = y.astype(out_ref.dtype)


def stem_reference(s2d: jnp.ndarray, w4: jnp.ndarray, scale: jnp.ndarray,
                   bias: jnp.ndarray) -> jnp.ndarray:
    """XLA formulation of the same math (16 tap slices + one matmul + bn +
    relu) — the oracle for tests and the backward path of the custom vjp."""
    K, Ho, Wo = s2d.shape
    sp = jnp.pad(s2d.astype(jnp.bfloat16), ((0, 0), (2, 1), (2, 1)))
    taps = jnp.concatenate(
        [sp[:, dh:dh + Ho, dw:dw + Wo] for dh in range(4) for dw in range(4)],
        axis=0)                                                  # [16K, Ho, Wo]
    acc = jax.lax.dot_general(
        w4.astype(jnp.bfloat16), taps.reshape(16 * K, Ho * Wo),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    y = jnp.maximum(acc * scale[:, None] + bias[:, None], 0.0)
    return y.astype(jnp.bfloat16).reshape(64, Ho, Wo)


def stem_conv1_bn_relu(s2d: jnp.ndarray, w4: jnp.ndarray, scale: jnp.ndarray,
                       bias: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """s2d: [12, Ho, Wo] planar image; w4: [192, 64] (conv1_w4);
    scale/bias: [64] folded bn_conv1. Returns relu(bn(conv1)) as planar
    [64, Ho, Wo] bfloat16. Requires Ho % 16 == 0 (Wo % 128 == 0 for the
    compiled path; any Wo in interpret mode).

    custom_vjp (backward = jax.vjp of ``stem_reference``): without it, jax's
    linearize re-traces the raw Pallas kernel outside its grid context and
    crashes the training step (jit(vmap(grad))) on TPU with
    "assert env.grid_context is not None"."""
    return _stem_vjp(s2d, w4, scale, bias, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _stem_vjp(s2d, w4, scale, bias, interpret):
    return _stem_impl(s2d, w4, scale, bias, interpret)


def _stem_fwd(s2d, w4, scale, bias, interpret):
    return _stem_impl(s2d, w4, scale, bias, interpret), (s2d, w4, scale, bias)


def _stem_bwd(interpret, res, g):
    _, vjp = jax.vjp(stem_reference, *res)
    return vjp(g)


_stem_vjp.defvjp(_stem_fwd, _stem_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _stem_impl(s2d: jnp.ndarray, w4: jnp.ndarray, scale: jnp.ndarray,
               bias: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    K, Ho, Wo = s2d.shape
    R = 16
    assert Ho % R == 0, (Ho, R)
    # rows padded to Ho+8 so the last program's [R+8]-row block load is in
    # bounds; cols padded (2, 1) for the 4 tap offsets
    sp = jnp.pad(s2d, ((0, 0), (2, 6), (2, 1)))                 # [12, Ho+8, Wo+3]
    sb = jnp.stack([scale, bias]).astype(jnp.float32)           # [2, 64]
    out = pl.pallas_call(
        functools.partial(_stem_kernel, rows=R, wo=Wo, kc=K),
        grid=(Ho // R,),
        in_specs=[
            pl.BlockSpec((K, Ho + 8, Wo + 3), lambda p: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * K, 64), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 64), lambda p: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((64, R * Wo), lambda p: (0, p),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, Ho * Wo), jnp.bfloat16),
        interpret=interpret,
    )(sp.astype(jnp.float32), w4, sb)
    return out.reshape(64, Ho, Wo)
