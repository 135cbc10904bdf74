"""Pallas TPU kernel: a VMEM-resident stack of identity-shortcut bottleneck
blocks (res4b1..res4b22 of ResNet-101).

The XLA formulation round-trips every intermediate activation through HBM:
per block it reads/writes ~20 MB at the flagship shape ([38, 64, 1024] bf16
feature map), ~460 MB across the 22 identical res4b units — making the res4
stack bandwidth-bound (reference graph: resnet_v1_101_rcnn_base.py:29-619,
res4b1..res4b22).

Here the feature map lives in VMEM for the whole stack:

  grid = (num_blocks,); the output block has a constant index map so Mosaic
  keeps it resident across grid steps; step 0 DMAs the input feature map into
  it; each step applies one full bottleneck in place:

    y1  = relu(x @ Wa + b1)            # 1x1 reduce      (MXU, [R, Cmid])
    y2  = relu(sum_t shift_t(y1) @ W3[t] + b2)   # 3x3 as 9 shifted matmuls
    x   = relu(x + y2 @ Wc + b3)       # 1x1 expand + residual (chunked rows)

  HBM traffic: x in + x out + per-block weights (~2.2 MB each) streamed by
  the kernel itself into a double-buffered VMEM scratch — ~58 MB total instead
  of ~460 MB. The weights deliberately arrive as ANY/HBM refs: XLA pins
  BlockSpec-VMEM pallas operands in VMEM for the whole program (S(1) scoped
  buffers), which starves the neighbouring backbone convs of VMEM and cost
  ~1 ms end-to-end.

Frozen-BN scales are pre-folded into the conv weights by the caller
(models/backbone.py::fold_res4_params or Bottleneck(fold=True)); biases ride as f32 vectors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _res4_kernel(x_hbm, wa_hbm, b1, w3_hbm, b2, wc_hbm, b3, out,
                 y1, y1p, wa_v, w3_v, wc_v, sem, wsem, *,
                 H, W, Cmid, chunk, num_blocks):
    R = H * W
    b = pl.program_id(0)

    # Weight stacks ride as 2-D arrays with blocks stacked on the SUBLANE axis
    # ([B*rows, cols] in HBM, [2*rows, cols] double-buffer scratch), sliced via
    # pl.ds — any 3-D [B, rows, cols] slicing needs lane-aligned slices, which
    # fails when cols < 128 (res2's Cmid=64).
    C = wa_v.shape[0] // 2

    _PARTS = ((wa_hbm, C, wa_v, 0), (w3_hbm, 9 * Cmid, w3_v, 1),
              (wc_hbm, Cmid, wc_v, 2))

    def fetch(i, slot):
        """Start the weight DMAs for block i into buffer ``slot``."""
        for hbm, rows, vmem, s in _PARTS:
            pltpu.make_async_copy(hbm.at[pl.ds(i * rows, rows), :],
                                  vmem.at[pl.ds(slot * rows, rows), :],
                                  wsem.at[slot, s]).start()

    def wait(slot):
        # reconstructs a descriptor shape-identical to fetch()'s to wait on
        # the matching semaphore (src block index is irrelevant for the wait)
        for hbm, rows, vmem, s in _PARTS:
            pltpu.make_async_copy(hbm.at[pl.ds(0, rows), :],
                                  vmem.at[pl.ds(slot * rows, rows), :],
                                  wsem.at[slot, s]).wait()

    @pl.when(b == 0)
    def _():
        # weights for block 0 stream while the feature map loads
        fetch(0, 0)
        dma = pltpu.make_async_copy(x_hbm, out, sem)
        dma.start()
        dma.wait()

    slot = jax.lax.rem(b, 2)
    # prefetch next block's weights into the other buffer, then wait for ours
    @pl.when(b + 1 < num_blocks)
    def _():
        fetch(b + 1, 1 - slot)
    wait(slot)

    wa = wa_v[pl.ds(slot * C, C), :]
    w3 = w3_v[pl.ds(slot * 9 * Cmid, 9 * Cmid), :]
    wc = wc_v[pl.ds(slot * Cmid, Cmid), :]
    dt = out.dtype
    x = out[:]                                               # [R, C] resident
    a = jnp.dot(x, wa, preferred_element_type=jnp.float32)
    y1[:] = jnp.maximum(a + b1[0, 0, :][None, :], 0.0).astype(dt)

    # zero-padded [H+2, W+2, Cmid] neighborhood for the 3x3 taps
    y1p[:] = jnp.zeros_like(y1p)
    y1p[1:H + 1, 1:W + 1, :] = y1[:].reshape(H, W, Cmid)

    acc = jnp.zeros((R, Cmid), jnp.float32)
    for t in range(9):
        dy, dx = t // 3, t % 3
        patch = y1p[dy:dy + H, dx:dx + W, :].reshape(R, Cmid)
        acc = acc + jnp.dot(patch, w3[t * Cmid:(t + 1) * Cmid, :],
                            preferred_element_type=jnp.float32)
    y2 = jnp.maximum(acc + b2[0, 0, :][None, :], 0.0).astype(dt)

    # 1x1 expand + residual, chunked so the f32 [chunk, C] stays small
    for c0 in range(0, R, chunk):
        y3 = jnp.dot(y2[c0:c0 + chunk, :], wc,
                     preferred_element_type=jnp.float32)
        res = out[c0:c0 + chunk, :].astype(jnp.float32)
        out[c0:c0 + chunk, :] = jnp.maximum(
            res + y3 + b3[0, 0, :][None, :], 0.0).astype(dt)


def _pick_chunk(R: int, C: int = 1024) -> int:
    """Largest divisor of R that keeps the f32 [chunk, C] epilogue ~<=2.5 MB
    (fewer chunks also keeps the unrolled Mosaic code small)."""
    cap = max(8, (2_500_000 // (C * 4)) // 8 * 8)
    for c in range(min(R, cap), 7, -8):
        if R % c == 0:
            return c
    return R


@jax.custom_vjp
def fused_bottleneck_stack(x: jnp.ndarray, wa, b1, w3, b2, wc, b3) -> jnp.ndarray:
    """Run a stack of B identity bottlenecks over x.

    x: [H, W, C] (bf16 on TPU); wa: [B, C, Cmid]; b1: [B, Cmid];
    w3: [B, 9*Cmid, Cmid] (tap-major rows, HWIO order); b2: [B, Cmid];
    wc: [B, Cmid, C]; b3: [B, C]. BN scales must already be folded into the
    weights. Returns [H, W, C] in x.dtype.

    Differentiable: forward = kernel; backward = jax.vjp of the jnp reference
    (training recomputes the stack; inference never takes that path).
    """
    return _fused_bottleneck_stack_impl(x, wa, b1, w3, b2, wc, b3, None)


def _vjp_fwd(x, wa, b1, w3, b2, wc, b3):
    return (fused_bottleneck_stack(x, wa, b1, w3, b2, wc, b3),
            (x, wa, b1, w3, b2, wc, b3))


def _vjp_bwd(res, g):
    _, vjp = jax.vjp(bottleneck_stack_reference, *res)
    return vjp(g)


def _fused_bottleneck_stack_impl(x, wa, b1, w3, b2, wc, b3,
                                 interpret: bool | None) -> jnp.ndarray:
    H, W, C = x.shape
    B, _, Cmid = wa.shape
    R = H * W
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    chunk = _pick_chunk(R, C)
    kernel = functools.partial(_res4_kernel, H=H, W=W, Cmid=Cmid, chunk=chunk,
                               num_blocks=B)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            # x and the weight stacks stay in HBM — the kernel streams each
            # block's weights itself (double-buffered). BlockSpec-VMEM weights
            # would let XLA pin the whole ~46 MB stack in VMEM for the life of
            # the program (S(1) operands), starving neighbouring convs.
            pl.BlockSpec(memory_space=pl.ANY),            # x
            pl.BlockSpec(memory_space=pl.ANY),            # wa [B, C, Cmid]
            pl.BlockSpec((1, 1, Cmid), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),            # w3 [B, 9*Cmid, Cmid]
            pl.BlockSpec((1, 1, Cmid), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),            # wc [B, Cmid, C]
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, C), lambda b: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((R, Cmid), x.dtype),                  # y1
            pltpu.VMEM((H + 2, W + 2, Cmid), x.dtype),       # padded y1
            pltpu.VMEM((2 * C, Cmid), x.dtype),              # wa double buffer
            pltpu.VMEM((2 * 9 * Cmid, Cmid), x.dtype),       # w3 double buffer
            pltpu.VMEM((2 * Cmid, C), x.dtype),              # wc double buffer
            pltpu.SemaphoreType.DMA,                         # feature-map DMA
            pltpu.SemaphoreType.DMA((2, 3)),                 # weight DMAs
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x.reshape(R, C), wa.reshape(B * C, Cmid), b1.reshape(B, 1, Cmid),
      w3.reshape(B * 9 * Cmid, Cmid), b2.reshape(B, 1, Cmid),
      wc.reshape(B * Cmid, C), b3.reshape(B, 1, C))
    return out.reshape(H, W, C)


def fused_bottleneck_stack_vmem_bytes(H: int, W: int, C: int,
                                      Cmid: int) -> int:
    """Kernel VMEM working set (resident state + scratch + double-buffered
    weights) — a sizing tool (tools/microbench_res4.py); callers that enable
    the kernel at non-flagship buckets should check this against the ~100 MB
    vmem budget themselves, Mosaic errors out at compile time past it."""
    R = H * W
    out_blk = R * C * 2
    y1 = R * Cmid * 2
    y1p = (H + 2) * (W + 2) * Cmid * 2
    weights = 2 * (C * Cmid + 9 * Cmid * Cmid + Cmid * C) * 2   # 2-slot scratch
    epilogue = _pick_chunk(R, C) * C * 4 + R * Cmid * 4            # f32 temporaries
    return out_blk + y1 + y1p + weights + epilogue


fused_bottleneck_stack.defvjp(_vjp_fwd, _vjp_bwd)


def bottleneck_stack_reference(x, wa, b1, w3, b2, wc, b3):
    """jnp reference with identical folded-weight math (f32 accumulation per
    conv, activations cast back to x.dtype between ops)."""
    H, W, C = x.shape
    B, _, Cmid = wa.shape
    dt = x.dtype
    for i in range(B):
        y1 = jnp.maximum(
            jnp.dot(x.reshape(-1, C).astype(jnp.float32),
                    wa[i].astype(jnp.float32)) + b1[i], 0.0
        ).astype(dt).reshape(H, W, Cmid)
        y1pad = jnp.pad(y1, ((1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((H * W, Cmid), jnp.float32)
        for t in range(9):
            dy, dx = t // 3, t % 3
            patch = y1pad[dy:dy + H, dx:dx + W, :].reshape(-1, Cmid)
            acc = acc + jnp.dot(patch.astype(jnp.float32),
                                w3[i, t * Cmid:(t + 1) * Cmid].astype(jnp.float32))
        y2 = jnp.maximum(acc + b2[i], 0.0).astype(dt)
        y3 = jnp.dot(y2.astype(jnp.float32), wc[i].astype(jnp.float32)) + b3[i]
        x = jnp.maximum(x.reshape(-1, C).astype(jnp.float32) + y3,
                        0.0).astype(dt).reshape(H, W, C)
    return x
