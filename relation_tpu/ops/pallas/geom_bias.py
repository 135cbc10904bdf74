"""Pallas TPU kernel: fused geometric attention bias for the relation / learned-NMS
attention modules.

Computes, in one pass over the pairwise geometry matrix,

    bias[c, g, n, m] = log(max(relu( trig(pos[c, :, n, m]) @ W + b ), 1e-6))

where ``trig`` is the reference's sinusoidal position embedding
(extract_pairwise_multi_position_embedding, reference ...learn_nms_base.py:224-246:
4 fields x 8 frequencies x {sin, cos}, feature layout [field*16 + (sin 0-7 | cos
8-15)]) and W/b are the ``nms_pair_pos_fc1`` dense parameters.

Why a kernel: this path is transcendental-bound — 2 * 32 * |pairs| sin/cos
evaluations (51M for the learned-NMS head at 80 classes x 100x100 pairs), measured
at ~1.0 ms as stock XLA ops. The kernel:
  - computes sin and cos TOGETHER from one range reduction (shared r, r^2),
  - uses a short odd/even polynomial (|err| < 2e-7, far below bf16 feature noise),
  - feeds the 64->G contraction straight to the MXU from VMEM,
  - streams [4, N, N] geometry tiles in and [G, N, N] bias tiles out — the
    [C, N, N, 64] embedding intermediate (200 MB at fp32) never exists.

The op is differentiable: forward = kernel, backward = a second Pallas kernel
that recomputes the trig rows per class tile in VMEM (residual-free — saving
the [C, 64, N, M] embedding would be the exact 200 MB the forward avoids) and
emits (d_pos, d_kernel, d_bias) in one pass; d_kernel/d_bias accumulate across
the sequential TPU grid. Measured on v5e at the train-branch shape (C=80,
N=M=100): fwd+bwd 604 us fused vs 1680 us for jax.vjp of the jnp reference —
the XLA path materializes the [C, 64, N, M] sinusoid for the d_kernel
contraction (einsums cannot fuse elementwise producers into dot operands).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 2.0 * np.pi
_INV_TWO_PI = 1.0 / _TWO_PI


def _frequencies(wave_length: float = 1000.0) -> np.ndarray:
    """1/lambda_k for k=0..7 (reference dim_mat, feat_dim=64, 8 fields)."""
    k = np.arange(8, dtype=np.float64)
    return (1.0 / np.power(wave_length, (8.0 / 64.0) * k)).astype(np.float32)


def _sincos(x):
    """(sin x, cos x) from one range reduction; poly |err| < 2e-7 on [-pi, pi]."""
    q = jnp.round(x * _INV_TWO_PI)
    r = x - q * _TWO_PI                       # r in [-pi, pi]
    r2 = r * r
    # sin: odd minimax-ish poly (Taylor-derived, accurate to ~1e-7 on [-pi, pi])
    s = r * (0.9999999820 + r2 * (-0.1666665668 + r2 *
             (0.0083330251 + r2 * (-0.0001980741 + r2 * 2.6019031e-06))))
    # cos: even poly
    c = (0.9999999764 + r2 * (-0.4999999052 + r2 *
         (0.0416665396 + r2 * (-0.0013888370 + r2 *
          (0.0000247609 - r2 * 2.605889e-07)))))
    return s, c


def _bias_kernel(pos_ref, w_ref, b_ref, out_ref, *, scale):
    """pos_ref: [Cb, 4, NN]; w_ref: [64, G]; b_ref: [1, G]; out_ref: [Cb, G, NN].

    Cb classes per grid program (unrolled) — a 1-class grid at C=79 pays the
    per-program launch/DMA-setup floor 79 times for ~40 us of work each."""
    freqs = _frequencies()
    cb = pos_ref.shape[0]

    for ci in range(cb):
        trig_rows = []
        for j in range(4):
            p = pos_ref[ci, j, :] * scale             # [NN]
            sins, coss = [], []
            for k in range(8):
                s, c = _sincos(p * float(freqs[k]))
                sins.append(s)
                coss.append(c)
            trig_rows.extend(sins)
            trig_rows.extend(coss)                    # layout: j*16 + (sin|cos)
        trig = jnp.stack(trig_rows, axis=0)           # [64, NN]

        # [G, 64] @ [64, NN] on the MXU
        acc = jax.lax.dot_general(
            w_ref[:, :], trig, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [G, NN]
        acc = acc + b_ref[0, :][:, None]
        out_ref[ci, :, :] = jnp.log(jnp.maximum(acc, 1e-6))


def _geom_bias_fwd_impl(pos_t: jnp.ndarray, kernel: jnp.ndarray,
                        bias: jnp.ndarray, scale: float,
                        interpret: bool) -> jnp.ndarray:
    C, four, N, M = pos_t.shape
    G = kernel.shape[1]
    nn_dim = N * M
    # batch classes per program to amortize the launch floor; measured at the
    # flagship shape (C=79, G=16, N=100) on v5e: cb=1 355 us, cb=2 341 us,
    # cb=4 347 us, cb=8 373 us — cb=2 balances floor amortization against
    # DMA/compute pipeline granularity. Bound the working set inside VMEM.
    cb = 2 if 2 * (4 + G) * nn_dim * 4 <= 8 * 2 ** 20 else 1
    cp = -(-C // cb) * cb
    pos_flat = jnp.zeros((cp, 4, nn_dim), pos_t.dtype).at[:C].set(
        pos_t.reshape(C, 4, nn_dim)) if cp != C else pos_t.reshape(C, 4, nn_dim)
    out = pl.pallas_call(
        functools.partial(_bias_kernel, scale=scale),
        grid=(cp // cb,),
        in_specs=[
            pl.BlockSpec((cb, 4, nn_dim), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, G), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), lambda c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cb, G, nn_dim), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cp, G, nn_dim), jnp.float32),
        interpret=interpret,
    )(pos_flat, kernel, bias.reshape(1, G))
    return out[:C].reshape(C, G, N, M)


def geom_bias_reference(pos_t: jnp.ndarray, kernel: jnp.ndarray,
                        bias: jnp.ndarray, scale: float = 100.0,
                        emb_dtype=None) -> jnp.ndarray:
    """jnp reference (reference-formula path): [C,4,N,M] -> [C,G,N,M].

    ``emb_dtype`` (e.g. bf16) casts the materialized [C, 64, N, M] sinusoid
    before the 64->G contraction (accumulation stays f32) — the XLA-only dense
    path (FPN learned-NMS tail, where the fused kernel is s2b-poison) is
    HBM-bound on exactly this intermediate (~400 MB f32 round trip at C=79,
    N=100). sin/cos are in [-1, 1] so the bf16 cast costs < 0.4% relative in
    the pre-log activation; parity eval flips this back to f32
    (experiments/test.py __meta__ handling, like ROI_METHOD / FPN_TOPK)."""
    freqs = jnp.asarray(_frequencies())
    div = pos_t[:, :, None, :, :] * scale * freqs[None, None, :, None, None]
    # feature layout per field: 8 sin then 8 cos -> [C, 4, 16, N, M] -> [C, 64, ...]
    emb = jnp.concatenate([jnp.sin(div), jnp.cos(div)], axis=2)
    C, _, _, N, M = emb.shape
    emb = emb.reshape(C, 64, N, M)
    if emb_dtype is not None:
        # plain same-dtype einsum (XLA CPU rejects BF16xBF16=F32 dots; the TPU
        # MXU accumulates bf16 dots in f32 internally regardless)
        emb = emb.astype(emb_dtype)
        kernel = kernel.astype(emb_dtype)
    acc = jnp.einsum("cfnm,fg->cgnm", emb, kernel).astype(jnp.float32) \
        + bias[None, :, None, None]
    return jnp.log(jnp.maximum(acc, 1e-6))


def _bias_bwd_kernel(pos_ref, w_ref, g_ref, dpos_ref, dk_ref, db_ref, *, scale):
    """Backward: recompute trig per class in VMEM, then
       acc    = W^T trig                       (+b folded into the clamp test)
       d_acc  = g / acc  where acc > 1e-6      (log∘max chain)
       d_K   += trig d_acc^T    d_b += Σ d_acc    d_trig = W d_acc
       d_pos[j] = scale Σ_k f_k (cos_jk d_sin_jk − sin_jk d_cos_jk)
    pos_ref [cb,4,NT]; w_ref [65,G] (the 65th row is the bias, contracted
    against a constant-1 trig row so acc = W^T trig + b is a single dot);
    g_ref [cb,G,NT]. The grid is (classes, NN-tiles): the [65, NN] trig stack
    at the head-relation shape (NN = N*M = 120k) is 31 MB — over the 16 MB
    scoped-VMEM stack limit — so NN is tiled too. dk_ref accumulates [65,G]
    (row 64 = d_bias, also emitted separately via db_ref); the grid is
    sequential on TPU so the revisited accumulator blocks are race-free."""
    freqs = _frequencies()
    cb = pos_ref.shape[0]

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    for ci in range(cb):
        trig_rows = []
        for j in range(4):
            p = pos_ref[ci, j, :] * scale             # [NN]
            sins, coss = [], []
            for k in range(8):
                s, c = _sincos(p * float(freqs[k]))
                sins.append(s)
                coss.append(c)
            trig_rows.extend(sins)
            trig_rows.extend(coss)
        trig_rows.append(jnp.ones_like(trig_rows[0])) # constant row -> bias
        trig = jnp.stack(trig_rows, axis=0)           # [65, NN]

        # acc EXACTLY as the forward computes it (64-row dot, then + b) so
        # the acc > 1e-6 clamp decision is bit-consistent between passes —
        # a folded 65-row dot rounds differently and can flip the clamp
        # where 1/acc amplifies the gradient toward 1e6
        acc = jax.lax.dot_general(                    # [G, NN] = W^T trig
            w_ref[:64, :], trig[:64], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + w_ref[64, :][:, None]
        g = g_ref[ci, :, :]                           # [G, NN]
        d_acc = jnp.where(acc > 1e-6, g / jnp.maximum(acc, 1e-6), 0.0)

        dk_ref[...] += jax.lax.dot_general(           # [65, G]
            trig, d_acc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        db_ref[...] += jnp.sum(d_acc, axis=1)[None, :]

        d_trig = jax.lax.dot_general(                 # [64, NN] = W d_acc
            w_ref[:64, :], d_acc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        for j in range(4):
            dp = jnp.zeros_like(trig[0])
            for k in range(8):
                s = trig[j * 16 + k]
                c = trig[j * 16 + 8 + k]
                dp = dp + float(freqs[k]) * (c * d_trig[j * 16 + k]
                                             - s * d_trig[j * 16 + 8 + k])
            dpos_ref[ci, j, :] = dp * scale


def _geom_bias_bwd_impl(pos_t, kernel, bias, g, scale, interpret):
    C, four, N, M = pos_t.shape
    G = kernel.shape[1]
    nn_dim = N * M
    cb = 1
    cp = -(-C // cb) * cb
    # tile the flattened N*M axis: working set per program is ~(169 rows x nt
    # lanes x 4 B) (trig 65 + d_trig 64 + pos/dpos 8 + g/d_acc 2G), so nt<=8k
    # stays ~5.5 MB — comfortably inside the 16 MB scoped-VMEM stack
    n_tiles = -(-nn_dim // min(nn_dim, 8192))
    per_tile = -(-nn_dim // n_tiles)
    nt = -(-per_tile // 128) * 128                    # even tiles, lane-aligned
    np_dim = nt * n_tiles
    pos_flat = pos_t.reshape(C, 4, nn_dim)
    g_flat = g.reshape(C, G, nn_dim)
    if cp != C or np_dim != nn_dim:
        pos_flat = jnp.zeros((cp, 4, np_dim), pos_t.dtype) \
            .at[:C, :, :nn_dim].set(pos_flat)
        # zero-padded cotangents contribute nothing to d_kernel/d_bias
        g_flat = jnp.zeros((cp, G, np_dim), g.dtype) \
            .at[:C, :, :nn_dim].set(g_flat)
    # bias rides as a 65th weight row against a constant-1 trig row, so the
    # kernel recomputes acc = W^T trig + b with a single dot
    w65 = jnp.concatenate([kernel, bias.reshape(1, G)], axis=0)   # [65, G]
    dpos, dk65, db = pl.pallas_call(
        functools.partial(_bias_bwd_kernel, scale=scale),
        grid=(cp // cb, n_tiles),
        in_specs=[
            pl.BlockSpec((cb, 4, nt), lambda c, t: (c, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((65, G), lambda c, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, G, nt), lambda c, t: (c, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((cb, 4, nt), lambda c, t: (c, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((65, G), lambda c, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), lambda c, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cp, 4, np_dim), jnp.float32),
            jax.ShapeDtypeStruct((65, G), jnp.float32),
            jax.ShapeDtypeStruct((1, G), jnp.float32),
        ],
        interpret=interpret,
    )(pos_flat, w65, g_flat)
    if np_dim != nn_dim:
        dpos = dpos[:, :, :nn_dim]
    # d_bias comes out twice (65th kernel row and the Σ d_acc output) — they
    # are the same quantity; use the dedicated output, drop the extra row
    return (dpos[:C].reshape(C, 4, N, M).astype(pos_t.dtype),
            dk65[:64].astype(kernel.dtype), db[0].astype(bias.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_geometric_bias(pos_t, kernel, bias, scale=100.0):
    """log-clamped geometric attention bias, fused.

    pos_t: [C, 4, N, M] pairwise geometry (field-major layout); kernel: [64, G]
    (same layout as the nms_pair_pos_fc1 Dense); bias: [G].
    Returns [C, G, N, M].
    """
    interpret = jax.devices()[0].platform == "cpu"
    return _geom_bias_fwd_impl(pos_t, kernel, bias, scale, interpret)


def _fwd(pos_t, kernel, bias, scale):
    return fused_geometric_bias(pos_t, kernel, bias, scale), (pos_t, kernel, bias)


def _bwd(scale, res, g):
    pos_t, kernel, bias = res
    interpret = jax.devices()[0].platform == "cpu"
    return _geom_bias_bwd_impl(pos_t, kernel, bias, g, scale, interpret)


fused_geometric_bias.defvjp(_fwd, _bwd)


def _bias_kernel_skip(active_ref, pos_ref, w_ref, b_ref, out_ref, *, scale):
    """Class-skipping variant: program c computes only when active_ref[c] != 0
    (the reference's inference-time valid-class filter, learn_nms.py:296-309).
    Inactive classes' output blocks are left unwritten — downstream masks them
    to zero (learn_nms head multiplies conditional scores by the active mask)."""
    c = pl.program_id(0)

    @pl.when(active_ref[c] != 0)
    def _():
        _bias_kernel(pos_ref, w_ref, b_ref, out_ref, scale=scale)


def fused_geometric_bias_skip(pos_t: jnp.ndarray, kernel: jnp.ndarray,
                              bias: jnp.ndarray, active: jnp.ndarray,
                              scale: float = 100.0,
                              interpret: bool | None = None) -> jnp.ndarray:
    """fused_geometric_bias with per-class skipping: ``active`` [C] int32.
    Inference-only (no VJP); inactive classes return garbage — mask downstream."""
    C, four, N, M = pos_t.shape
    G = kernel.shape[1]
    nn_dim = N * M
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, 4, nn_dim), lambda c, aref: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, G), lambda c, aref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), lambda c, aref: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, nn_dim), lambda c, aref: (c, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_bias_kernel_skip, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C, G, nn_dim), jnp.float32),
        interpret=interpret,
    )(active.astype(jnp.int32), pos_t.reshape(C, 4, nn_dim), kernel,
      bias.reshape(1, G))
    return out.reshape(C, G, N, M)
