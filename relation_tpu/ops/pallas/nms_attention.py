"""Pallas TPU kernel: the learned-NMS relation attention, fully fused.

One kernel invocation per fg class computes, without leaving VMEM:

    trig   = sincos(100 * pos / lambda_k)                  # 4 fields x 8 freqs
    bias   = log(max(trig @ Wg + bg, 1e-6))                # [G, N, N] geometric bias
    aff_g  = (q_g k_g^T) / sqrt(d)                         # per group
    attn_g = softmax(aff_g + bias_g)
    av_g   = attn_g @ v                                    # [N, F]
    out    = concat_g(av_g @ Wl_g)                         # grouped linear_out

This is the reference's ``attention_module_nms_multi_head``
(symbols/..._learn_nms.py:158-238) as a single fused attention kernel — the
[C, G, N, N] bias and attention tensors (2 x 12.8 MB at the flagship shape) and the
[C, N, N, 64] sinusoid embedding (205 MB) never touch HBM.

Differentiable via custom_vjp: forward = kernel, backward = jax.vjp of the jnp
reference (training takes that path; inference never does).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from relation_tpu.ops.pallas.geom_bias import _frequencies, _sincos


def _attention_kernel(pos_ref, q_ref, k_ref, v_ref, wg_ref, bg_ref, wl_ref,
                      out_ref, *, scale, groups, dqk, n):
    """Blocks (one class): pos [1, 4, N, N]; q,k [1, N, G*dqk]; v [1, N, F];
    wg [64, G]; bg [1, G]; wl [G*F, E]; out [1, N, G*E].

    Everything stays in [N, N] layout — Mosaic rejects unaligned flat<->2D
    reshapes, so the 64->G bias contraction runs as an unrolled FMA chain over
    the trig planes instead of a matmul (64 x G vector FMAs, negligible next to
    the transcendentals)."""
    freqs = _frequencies()
    G = groups
    F = v_ref.shape[2]
    E = out_ref.shape[2] // G

    # trig planes: 64 x [N, N], feature order j*16 + (sin 0-7 | cos 8-15)
    trig = []
    for j in range(4):
        p = pos_ref[0, j, :, :] * scale                       # [N, N]
        sins, coss = [], []
        for kf in range(8):
            s, c = _sincos(p * float(freqs[kf]))
            sins.append(s)
            coss.append(c)
        trig.extend(sins)
        trig.extend(coss)

    v = v_ref[0]                                              # [N, F]
    inv_sqrt = 1.0 / float(np.sqrt(dqk))
    for g in range(G):
        acc = jnp.full((n, n), 0.0, dtype=jnp.float32)
        for f in range(64):
            acc = acc + trig[f] * wg_ref[f, g]
        bias = jnp.log(jnp.maximum(acc + bg_ref[0, g], 1e-6))

        qg = q_ref[0, :, g * dqk:(g + 1) * dqk]               # [N, dqk]
        kg = k_ref[0, :, g * dqk:(g + 1) * dqk]
        aff = jax.lax.dot_general(
            qg, kg, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_sqrt    # [N, N]
        w = aff + bias
        w = w - jnp.max(w, axis=-1, keepdims=True)
        e = jnp.exp(w)
        attn = e / jnp.sum(e, axis=-1, keepdims=True)
        av = jnp.dot(attn, v, preferred_element_type=jnp.float32)   # [N, F]
        wl_g = wl_ref[g * F:(g + 1) * F, :]                   # [F, E]
        out_ref[0, :, g * E:(g + 1) * E] = jnp.dot(
            av, wl_g, preferred_element_type=jnp.float32)


def nms_relation_attention_reference(pos_t, q, k, v, wg, bg, wl,
                                     scale: float = 100.0):
    """jnp reference. pos_t [C,4,N,N]; q,k [C,N,G*dqk]; v [C,N,F];
    wg [64,G]; bg [G]; wl [G,F,E] -> out [C,N,G*E] (head-major)."""
    from relation_tpu.ops.pallas.geom_bias import geom_bias_reference
    C, N = q.shape[0], q.shape[1]
    G = wg.shape[1]
    dqk = q.shape[2] // G
    bias = geom_bias_reference(pos_t, wg, bg, scale)          # [C, G, N, N]
    qg = q.reshape(C, N, G, dqk)
    kg = k.reshape(C, N, G, dqk)
    aff = jnp.einsum("cigd,cjgd->cgij", qg, kg) / np.sqrt(dqk)
    attn = jax.nn.softmax(aff + bias, axis=-1)
    av = jnp.einsum("cgij,cjf->cgif", attn, v)                # [C, G, N, F]
    # NOTE output subscripts "cige" order the axes (c, i, g, e) = [C, N, G, E]
    # directly — reshaping gives head-major channels g*E+e with no transpose.
    # (The pre-fused module erroneously transposed here, scrambling channels
    # across ROIs; the kernel parity test caught it.)
    y = jnp.einsum("cgif,gfe->cige", av, wl)                  # [C, N, G, E]
    return y.reshape(C, N, -1)                                # [C, N, G*E]


def _impl(pos_t, q, k, v, wg, bg, wl, scale, interpret):
    C, _, N, _ = pos_t.shape
    G = wg.shape[1]
    dqk = q.shape[2] // G
    F = v.shape[2]
    E = wl.shape[2]
    out = pl.pallas_call(
        functools.partial(_attention_kernel, scale=scale, groups=G, dqk=dqk, n=N),
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, 4, N, N), lambda c: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, G * dqk), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, G * dqk), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, F), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, G), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G * F, E), lambda c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, G * E), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, N, G * E), jnp.float32),
        interpret=interpret,
    )(pos_t, q, k, v, wg, bg.reshape(1, G), wl.reshape(G * F, E))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_nms_relation_attention(pos_t, q, k, v, wg, bg, wl, scale=100.0):
    """Fused learned-NMS relation attention. Shapes as in the reference impl
    above; returns [C, N, G*E] (head-major output channels, matching the
    reference's grouped linear_out layout)."""
    interpret = jax.devices()[0].platform == "cpu"
    return _impl(pos_t, q, k, v, wg, bg, wl, scale, interpret)


def _fwd(pos_t, q, k, v, wg, bg, wl, scale):
    return (fused_nms_relation_attention(pos_t, q, k, v, wg, bg, wl, scale),
            (pos_t, q, k, v, wg, bg, wl))


def _bwd(scale, res, g):
    pos_t, q, k, v, wg, bg, wl = res
    _, vjp = jax.vjp(
        lambda *a: nms_relation_attention_reference(*a, scale=scale),
        pos_t, q, k, v, wg, bg, wl)
    return vjp(g)


fused_nms_relation_attention.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Two-stage fast path: geometric bias from ops/pallas/geom_bias.py (MXU
# contraction over the flat [64, N*N] trig matrix), then this kernel for the
# attention itself. The XLA formulation of the attention shuttles ~6 copies of
# the [C, G, N, N] f32 tensor (51 MB at the flagship shape) through HBM for
# aff/softmax/av; here each class's working set stays in VMEM and HBM sees the
# bias exactly once.
# ---------------------------------------------------------------------------


def _bias_attention_kernel(bias_ref, q_ref, k_ref, v_ref, wl_ref, out_ref, *,
                           groups, dqk):
    """Blocks (one class): bias [1, G, N, N]; q,k [1, N, G*dqk]; v [1, N, F];
    wl [G*F, E]; out [1, N, G*E]."""
    G = groups
    F = v_ref.shape[2]
    E = out_ref.shape[2] // G
    v = v_ref[0]
    inv_sqrt = 1.0 / float(np.sqrt(dqk))
    cols = []
    for g in range(G):
        qg = q_ref[0, :, g * dqk:(g + 1) * dqk]               # [N, dqk]
        kg = k_ref[0, :, g * dqk:(g + 1) * dqk]
        aff = jax.lax.dot_general(
            qg, kg, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_sqrt    # [N, N]
        w = aff + bias_ref[0, g]
        w = w - jnp.max(w, axis=-1, keepdims=True)
        e = jnp.exp(w)
        attn = e / jnp.sum(e, axis=-1, keepdims=True)
        av = jnp.dot(attn, v, preferred_element_type=jnp.float32)   # [N, F]
        cols.append(jnp.dot(av, wl_ref[g * F:(g + 1) * F, :],
                            preferred_element_type=jnp.float32))    # [N, E]
    out_ref[0] = jnp.concatenate(cols, axis=1)                # [N, G*E]


def bias_attention_reference(bias, q, k, v, wl):
    """jnp reference. bias [C,G,N,N]; q,k [C,N,G*dqk]; v [C,N,F]; wl [G,F,E]
    -> [C, N, G*E] (head-major output channels)."""
    C, N = q.shape[0], q.shape[1]
    G = bias.shape[1]
    dqk = q.shape[2] // G
    qg = q.reshape(C, N, G, dqk)
    kg = k.reshape(C, N, G, dqk)
    aff = jnp.einsum("cigd,cjgd->cgij", qg, kg) / np.sqrt(dqk)
    attn = jax.nn.softmax(aff + bias, axis=-1)
    av = jnp.einsum("cgij,cjf->cgif", attn, v)
    y = jnp.einsum("cgif,gfe->cige", av, wl)
    return y.reshape(C, N, -1)


def _bias_attention_impl(bias, q, k, v, wl, interpret):
    C, _, N, _ = bias.shape
    G = bias.shape[1]
    dqk = q.shape[2] // G
    F = v.shape[2]
    E = wl.shape[2]
    return pl.pallas_call(
        functools.partial(_bias_attention_kernel, groups=G, dqk=dqk),
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, G, N, N), lambda c: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, G * dqk), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, G * dqk), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, F), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * F, E), lambda c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, G * E), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, N, G * E), jnp.float32),
        interpret=interpret,
    )(bias, q, k, v, wl.reshape(G * F, E))


@jax.custom_vjp
def fused_bias_attention(bias, q, k, v, wl):
    """Attention with a precomputed additive [C, G, N, N] bias, fused per class.
    Returns [C, N, G*E] (head-major output channels, grouped linear_out layout,
    reference symbols/..._learn_nms.py:219-238)."""
    interpret = jax.devices()[0].platform == "cpu"
    return _bias_attention_impl(bias, q, k, v, wl, interpret)


def _ba_fwd(bias, q, k, v, wl):
    return fused_bias_attention(bias, q, k, v, wl), (bias, q, k, v, wl)


def _ba_bwd(res, g):
    _, vjp = jax.vjp(bias_attention_reference, *res)
    return vjp(g)


fused_bias_attention.defvjp(_ba_fwd, _ba_bwd)


def _bias_attention_kernel_skip(active_ref, bias_ref, q_ref, k_ref, v_ref,
                                wl_ref, out_ref, *, groups, dqk):
    c = pl.program_id(0)

    @pl.when(active_ref[c] != 0)
    def _():
        _bias_attention_kernel(bias_ref, q_ref, k_ref, v_ref, wl_ref, out_ref,
                               groups=groups, dqk=dqk)


def fused_bias_attention_skip(bias, q, k, v, wl, active,
                              interpret: bool | None = None):
    """fused_bias_attention with per-class skipping: ``active`` [C] int32
    (reference valid-class filter, learn_nms.py:296-309). Inference-only;
    inactive classes return garbage — mask downstream."""
    C, G = bias.shape[0], bias.shape[1]
    N = q.shape[1]
    dqk = q.shape[2] // G
    F = v.shape[2]
    E = wl.shape[2]
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, G, N, N), lambda c, aref: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, G * dqk), lambda c, aref: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, G * dqk), lambda c, aref: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, F), lambda c, aref: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * F, E), lambda c, aref: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, G * E), lambda c, aref: (c, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_bias_attention_kernel_skip, groups=G, dqk=dqk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C, N, G * E), jnp.float32),
        interpret=interpret,
    )(active.astype(jnp.int32), bias, q, k, v, wl.reshape(G * F, E))


def _attention_kernel_skip(active_ref, pos_ref, q_ref, k_ref, v_ref, wg_ref,
                           bg_ref, wl_ref, out_ref, *, scale, groups, dqk, n):
    c = pl.program_id(0)

    @pl.when(active_ref[c] != 0)
    def _():
        _attention_kernel(pos_ref, q_ref, k_ref, v_ref, wg_ref, bg_ref, wl_ref,
                          out_ref, scale=scale, groups=groups, dqk=dqk, n=n)


def fused_nms_relation_attention_skip(pos_t, q, k, v, wg, bg, wl, active,
                                      scale: float = 100.0,
                                      interpret: bool | None = None):
    """Single fused kernel (bias + attention, nothing but in/out touches HBM)
    with per-class skipping: ``active`` [C] int32 (the reference's inference
    valid-class filter, learn_nms.py:296-309). Per-class cost ~14 us on v5e;
    with the typical <=20 active classes of a trained COCO model this beats
    both the dense XLA mix (~770 us) and the two-stage skip path (~400 us DMA
    floor). Inference-only (no VJP); skipped classes return garbage — the
    learned-NMS head masks their conditional scores with where()."""
    C, _, N, _ = pos_t.shape
    G = wg.shape[1]
    dqk_ = q.shape[2] // G
    F = v.shape[2]
    E = wl.shape[2]
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, 4, N, N), lambda c, aref: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, G * dqk_), lambda c, aref: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, G * dqk_), lambda c, aref: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, F), lambda c, aref: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, G), lambda c, aref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), lambda c, aref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * F, E), lambda c, aref: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, G * E), lambda c, aref: (c, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_attention_kernel_skip, scale=scale, groups=G,
                          dqk=dqk_, n=N),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C, N, G * E), jnp.float32),
        interpret=interpret,
    )(active.astype(jnp.int32), pos_t, q, k, v, wg, bg.reshape(1, G),
      wl.reshape(G * F, E))
