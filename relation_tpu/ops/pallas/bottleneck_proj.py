"""Pallas TPU kernel: one projection bottleneck block (res2a / res3a / res4a).

Companion to ops/pallas/res4.py (the identity-block stack): together they cover
every block of ResNet-101 stages 2-4 (reference resnet_v1_101_rcnn_base.py:29-619),
so the whole trunk between the fused stem and the dilated res5 can run as Pallas
kernels. That matters beyond raw kernel speed: an XLA conv chain that FEEDS a
Pallas call loses its space-to-batch rewrites (~+1 ms of wrapper copies at the
flagship shape — see tools/microbench_res4.py post-mortem); with no XLA convs
upstream of any pallas call, nothing is poisoned.

MEASURED VERDICT (v5e, 608x1024 flagship, kept for the record): the all-Pallas
trunk is numerically right (corr 0.9999 vs the conv path) but SLOWER —
1657 us vs 1360 us for the plain XLA c4 — because XLA's space-to-batch convs
on the big-spatial res2/res3 stages beat the 9-shifted-matmul formulation here
(which additionally pads res2's Cmid 64->128 for lane-aligned weight DMAs).
Ordering: plain 1360 < all-pallas 1657 < res4-kernel-only 2372 (s2b poison).
So production keeps the XLA trunk; these kernels stay available through
``ResNet101C4.__call__(..., trunk_folded=fold_trunk_params(params))`` and are
CI-tested in interpret mode. A future winning version needs im2col (K=9*Cmid)
instead of 9 shifted matmuls on the R~39k stages.

Computation (Caffe-style bottleneck with projection, stride s on branch2a and
branch1 — rcnn_base.py res3a/res4a):

    xs  = x[::s, ::s]                          # in-VMEM decimation
    sc  = xs @ W1 + b1p                        # branch1 projection
    y1  = relu(xs @ Wa + b1)                   # 1x1 reduce
    y2  = relu(sum_t shift_t(y1) @ W3[t] + b2) # 3x3 as 9 shifted matmuls
    out = relu(sc + y2 @ Wc + b3)              # 1x1 expand + projection sum

All BN scales pre-folded into weights (fold math identical to
models/backbone.py::Bottleneck(fold=True)); biases ride f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from relation_tpu.ops.pallas.res4 import _pick_chunk


def _proj_kernel(x_hbm, w1, b1p, wa, b1, w3, b2, wc, b3, out, xv, y1, y1p, sem,
                 *, H, W, Cin, Cmid, Cout, stride, chunk):
    """H, W are the OUTPUT spatial dims; input is [H*stride, W*stride, Cin]."""
    R = H * W
    dma = pltpu.make_async_copy(x_hbm, xv, sem)
    dma.start()
    dma.wait()
    dt = out.dtype

    if stride == 1:
        xs = xv[:].reshape(R, Cin)
    else:
        # decimate rows and columns in VMEM: [Hs, s, Ws, s, C] -> [:, 0, :, 0]
        xs = (xv[:].reshape(H, stride, W, stride, Cin)[:, 0, :, 0, :]
              .reshape(R, Cin))

    a = jnp.dot(xs, wa[:], preferred_element_type=jnp.float32)
    y1[:] = jnp.maximum(a + b1[0, :][None, :], 0.0).astype(dt)

    y1p[:] = jnp.zeros_like(y1p)
    y1p[1:H + 1, 1:W + 1, :] = y1[:].reshape(H, W, Cmid)

    acc = jnp.zeros((R, Cmid), jnp.float32)
    for t in range(9):
        dy, dx = t // 3, t % 3
        patch = y1p[dy:dy + H, dx:dx + W, :].reshape(R, Cmid)
        acc = acc + jnp.dot(patch, w3[t * Cmid:(t + 1) * Cmid, :],
                            preferred_element_type=jnp.float32)
    y2 = jnp.maximum(acc + b2[0, :][None, :], 0.0).astype(dt)

    # branch1 + expand + sum, row-chunked to bound the f32 temporaries
    for c0 in range(0, R, chunk):
        sc = jnp.dot(xs[c0:c0 + chunk, :], w1[:],
                     preferred_element_type=jnp.float32) + b1p[0, :][None, :]
        y3 = jnp.dot(y2[c0:c0 + chunk, :], wc[:],
                     preferred_element_type=jnp.float32) + b3[0, :][None, :]
        out[c0:c0 + chunk, :] = jnp.maximum(sc + y3, 0.0).astype(dt)


def fused_proj_bottleneck(x, w1, b1p, wa, b1, w3, b2, wc, b3, *, stride=1,
                          interpret=None):
    """x: [H, W, Cin]; w1: [Cin, Cout]; wa: [Cin, Cmid]; w3: [9*Cmid, Cmid]
    (tap-major); wc: [Cmid, Cout]; biases f32. Returns [H/stride, W/stride, Cout].
    """
    Hi, Wi, Cin = x.shape
    if Hi % stride or Wi % stride:
        raise ValueError(
            f"fused_proj_bottleneck needs stride-divisible spatial dims, got "
            f"{(Hi, Wi)} at stride {stride}: the conv path uses ceil-mode "
            f"output sizes for odd dims, which this kernel does not replicate")
    Cmid = wa.shape[1]
    Cout = wc.shape[1]
    H, W = Hi // stride, Wi // stride
    R = H * W
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    chunk = _pick_chunk(R, Cout)
    kernel = functools.partial(_proj_kernel, H=H, W=W, Cin=Cin, Cmid=Cmid,
                               Cout=Cout, stride=stride, chunk=chunk)
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [vm()] * 8,
        out_specs=pl.BlockSpec((R, Cout), lambda b: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((Hi, Wi, Cin), x.dtype),              # staged input
            pltpu.VMEM((R, Cmid), x.dtype),                  # y1
            pltpu.VMEM((H + 2, W + 2, Cmid), x.dtype),       # padded y1
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w1, b1p.reshape(1, Cout), wa, b1.reshape(1, Cmid), w3,
      b2.reshape(1, Cmid), wc, b3.reshape(1, Cout))
    return out.reshape(H, W, Cout)


def proj_bottleneck_reference(x, w1, b1p, wa, b1, w3, b2, wc, b3, *, stride=1):
    """jnp reference with the same folded-weight math (f32 accumulation)."""
    Hi, Wi, Cin = x.shape
    Cmid = wa.shape[1]
    H, W = Hi // stride, Wi // stride
    dt = x.dtype
    xs = x[::stride, ::stride][:H, :W].reshape(-1, Cin)
    f32 = jnp.float32
    sc = jnp.dot(xs.astype(f32), w1.astype(f32)) + b1p
    y1 = jnp.maximum(jnp.dot(xs.astype(f32), wa.astype(f32)) + b1, 0.0
                     ).astype(dt).reshape(H, W, Cmid)
    y1pad = jnp.pad(y1, ((1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((H * W, Cmid), f32)
    for t in range(9):
        dy, dx = t // 3, t % 3
        patch = y1pad[dy:dy + H, dx:dx + W, :].reshape(-1, Cmid)
        acc = acc + jnp.dot(patch.astype(f32),
                            w3[t * Cmid:(t + 1) * Cmid].astype(f32))
    y2 = jnp.maximum(acc + b2, 0.0).astype(dt)
    y3 = jnp.dot(y2.astype(f32), wc.astype(f32)) + b3
    return jnp.maximum(sc + y3, 0.0).astype(dt).reshape(H, W, -1)
