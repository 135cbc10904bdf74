"""Object Relation Module — 16-head scaled-dot-product attention between ROI
features with a log-clamped geometric bias.

Mirrors ``attention_module_multi_head``
(reference: relation_rcnn/symbols/resnet_v1_101_rcnn_attention_1024_pairwise_position_multi_head_16_learn_nms.py:90-156):

  aff      = (Q K^T) / sqrt(d_head)                    # appearance affinity
  w_g      = relu(FC(position_embedding))              # geometric weight
  weighted = log(max(w_g, 1e-6)) + aff                 # fused as an additive bias
  attn     = softmax(weighted, axis=keys)
  out      = grouped_linear(attn @ V),   V = raw key features (no value projection)

The geometric branch (sinusoid embedding -> FC -> relu -> log) is computed by one
fused Pallas kernel (ops/pallas/geom_bias.py) directly from the pairwise geometry
matrix — the sin/cos expansion (the measured hot spot of the learned-NMS head) never
materializes. The kernel's parameters live under the same names/shapes as the
reference's pair_pos_fc1 dense, so checkpoints are unaffected.

The grouped 1x1 conv of the reference (linear_out_*, num_group=16) is an einsum over
a [heads, feat, out/heads] weight — head-major output channel layout matches the
reference's grouped-conv layout exactly, so converted weights drop in.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from relation_tpu.ops.pallas.geom_bias import (fused_geometric_bias,
                                               geom_bias_reference)

_norm_init = nn.initializers.normal(0.01)


class GeomBiasDense(nn.Module):
    """The pair_pos_fc1 dense as a fused geometric-bias op.

    Parameters (kernel [64, features], bias [features]) are identical in path and
    layout to an ``nn.Dense`` over the 64-d sinusoid embedding, but the forward
    computes log(max(emb @ W + b, 1e-6)) straight from the geometry matrix.
    """
    features: int
    fused: bool = True
    emb_dtype: Any = None        # XLA path only: sinusoid dtype (see geom_bias)

    @nn.compact
    def __call__(self, pos_t: jnp.ndarray) -> jnp.ndarray:
        """pos_t: [C, 4, N, M] -> [C, features, N, M]."""
        k = self.param("kernel", _norm_init, (64, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.fused:
            return fused_geometric_bias(pos_t, k, b)
        return geom_bias_reference(pos_t, k, b, emb_dtype=self.emb_dtype)


class RelationModule(nn.Module):
    """One relation attention block for the detection head.

    __call__(roi_feat [N, feat_dim], position_mat_t [4, N, K]) -> [N, dim_out]
    where the keys/values are the first K (= nongt_dim) rows of roi_feat.
    """
    index: int = 1
    groups: int = 16
    dim_qk: int = 1024
    dim_out: int = 1024
    dtype: Any = jnp.float32
    # False = pure-XLA path (no pallas calls). REQUIRED for graphs whose convs
    # are space-to-batch eligible (FPN stride-4/8 levels): any pallas call
    # consuming conv-derived tensors forfeits their s2b rewrites (CLAUDE.md).
    allow_pallas: bool = True
    geom_emb_dtype: Any = None   # XLA path: sinusoid dtype (None = f32)

    @nn.compact
    def __call__(self, roi_feat: jnp.ndarray, position_mat_t: jnp.ndarray):
        n = roi_feat.shape[0]
        k = position_mat_t.shape[2]              # nongt_dim
        g = self.groups
        dqk = self.dim_qk // g

        nongt_feat = roi_feat[:k]                # keys/values: non-gt proposals only

        # geometric bias: [4, N, K] -> [1, g, N, K] -> [N, g, K]
        bias = GeomBiasDense(self.groups, fused=self.allow_pallas,
                             emb_dtype=self.geom_emb_dtype,
                             name=f"pair_pos_fc1_{self.index}")(
            position_mat_t[None])[0]
        bias = jnp.transpose(bias, (1, 0, 2))    # [N, g, K]

        q = nn.Dense(self.dim_qk, name=f"query_{self.index}", dtype=self.dtype,
                     kernel_init=_norm_init)(roi_feat)
        kk = nn.Dense(self.dim_qk, name=f"key_{self.index}", dtype=self.dtype,
                      kernel_init=_norm_init)(nongt_feat)
        q = q.reshape(n, g, dqk)
        kk = kk.reshape(k, g, dqk)

        aff = jnp.einsum("ngd,kgd->ngk", q, kk) / jnp.sqrt(float(dqk))
        # softmax always in f32 (bias is f32 from the fused log-geometry kernel);
        # the matmuls around it ride self.dtype (bf16 on the TPU fast path)
        attn = nn.softmax(aff.astype(jnp.float32) + bias, axis=-1)

        v = nongt_feat                                            # [K, feat]
        out = jnp.einsum("ngk,kf->ngf", attn.astype(v.dtype), v)  # [N, g, feat]

        # grouped linear_out: weight [g, feat, dim_out // g], head-major output
        feat_dim = v.shape[-1]
        w = self.param(f"linear_out_{self.index}_weight", _norm_init,
                       (g, feat_dim, self.dim_out // g))
        b = self.param(f"linear_out_{self.index}_bias", nn.initializers.zeros,
                       (self.dim_out,))
        y = jnp.einsum("ngf,gfe->nge", out, w.astype(out.dtype)
                       ).reshape(n, self.dim_out).astype(jnp.float32) + b
        return y


class NMSRelationModule(nn.Module):
    """Per-class relation attention for the learned-NMS head.

    Mirrors ``attention_module_nms_multi_head`` (reference ...learn_nms.py:158-238):
    operates on [first_n, num_fg_classes, feat_dim] with per-class pairwise geometry.

    __call__(roi_feat [N, C, F], position_mat_t [C, 4, N, N]) ->
        ([N, C, dim_out], attention [C, g, N, N]).
    """
    index: int = 1
    groups: int = 16
    dim_qk: int = 1024
    dim_out: int = 128
    dtype: Any = jnp.float32

    fully_fused: bool = False   # single-kernel path (ops/pallas/nms_attention);
                                # measured slightly slower at N=100 (lane padding
                                # blocks the MXU bias contraction) — off by default
    allow_pallas: bool = True   # False = pure-XLA dense path (see RelationModule)
    geom_emb_dtype: Any = None  # XLA dense path: sinusoid dtype (None = f32)
    # XLA path only: when ``active`` says at most this many classes survive the
    # inference class_thresh filter, gather them into a compact [m, ...] batch
    # before the dense attention (the XLA analogue of the Pallas skip kernel —
    # the reference shrinks its attention batch the same way,
    # operator_py/learn_nms.py:296-309). 0 disables.
    compact_classes: int = 32

    @nn.compact
    def __call__(self, roi_feat: jnp.ndarray, position_mat_t: jnp.ndarray,
                 active: jnp.ndarray | None = None):
        """``active``: optional [C] int32 valid-class mask (inference only) —
        both Pallas stages skip inactive classes entirely (the reference's
        class_thresh filter shrinks its attention batch the same way,
        learn_nms.py:296-309). Skipped classes return garbage; the learned-NMS
        head masks their conditional scores to zero."""
        n, c, f = roi_feat.shape
        g = self.groups
        dqk = self.dim_qk // g

        feat = jnp.transpose(roi_feat, (1, 0, 2))                 # [C, N, F]

        q = nn.Dense(self.dim_qk, name=f"nms_query_{self.index}", dtype=self.dtype,
                     kernel_init=_norm_init)(feat)                # [C, N, dim_qk]
        k = nn.Dense(self.dim_qk, name=f"nms_key_{self.index}", dtype=self.dtype,
                     kernel_init=_norm_init)(feat)

        wg, bg = _DenseParams((64, g),
                              name=f"nms_pair_pos_fc1_{self.index}")()
        wl = self.param(f"nms_linear_out_{self.index}_weight", _norm_init,
                        (g, f, self.dim_out // g))
        bl = self.param(f"nms_linear_out_{self.index}_bias",
                        nn.initializers.zeros, (self.dim_out,))

        if not self.allow_pallas:
            # XLA-only (FPN: any pallas call here poisons the upstream s2b
            # convs — CLAUDE.md). Dense over every class by default; with the
            # inference class filter, gather the active classes into a compact
            # [m, ...] batch first (attention is per-class independent, so the
            # compacted rows are exactly the dense rows). Skipped classes
            # return unmasked garbage: zeros pre-bias (+bl after the scatter),
            # and up to m - sum(active) inactive classes picked by the argsort
            # pad compute full attention values — the learn-NMS head's where()
            # mask (see the docstring above) is the load-bearing guard.
            def dense_path(_):
                return _dense_attention_impl(position_mat_t, q, k, feat, wg,
                                             bg, wl, c, n, g, dqk,
                                             fused_bias=False,
                                             emb_dtype=self.geom_emb_dtype)

            m = self.compact_classes
            if active is not None and 0 < m < c:
                def compact_path(_):
                    idx = jnp.argsort(-active)[:m]       # active-first, stable
                    yc = _dense_attention_impl(
                        position_mat_t[idx], q[idx], k[idx], feat[idx],
                        wg, bg, wl, m, n, g, dqk, fused_bias=False,
                        emb_dtype=self.geom_emb_dtype)
                    return jnp.zeros((c, n, yc.shape[-1]), yc.dtype
                                     ).at[idx].set(yc, unique_indices=True)

                y = jax.lax.cond(jnp.sum(active) <= m, compact_path,
                                 dense_path, None)
            else:
                y = dense_path(None)
        elif active is not None:
            # runtime choice by active-class count (measured on v5e, C=80,
            # N=100): the single fused kernel with per-class skip costs
            # ~14 us/active class (5 active -> 166 us, 20 -> 372 us) but
            # 1146 us dense, while the geom_bias + XLA-einsum mix is a flat
            # ~770 us. Typical trained-COCO images have 5-20 classes above
            # the 0.01 threshold; the cond keeps the dense worst case too.
            from relation_tpu.ops.pallas.nms_attention import (
                fused_nms_relation_attention_skip)

            def skip_path(_):
                # the per-class kernel is floor-limited by program overhead,
                # not bandwidth — run it in f32 regardless of self.dtype
                return fused_nms_relation_attention_skip(
                    position_mat_t, q.astype(jnp.float32),
                    k.astype(jnp.float32), feat.astype(jnp.float32),
                    wg, bg, wl, active)

            def dense_path(_):
                return _dense_attention_impl(position_mat_t, q, k, feat,
                                             wg, bg, wl, c, n, g, dqk)

            y = jax.lax.cond(jnp.sum(active) <= c // 2, skip_path, dense_path,
                             None)
        elif self.fully_fused:
            from relation_tpu.ops.pallas.nms_attention import (
                fused_nms_relation_attention)
            y = fused_nms_relation_attention(
                position_mat_t, q.astype(jnp.float32), k.astype(jnp.float32),
                feat.astype(jnp.float32), wg, bg, wl)
        else:
            # fused Pallas geometric bias + XLA attention: the fastest measured
            # dense mix at C=80, N=100 (707 us vs 810 us for the per-class
            # Pallas attention kernel — XLA's big batched einsums beat 80
            # sequential grid programs)
            y = _dense_attention_impl(position_mat_t, q, k, feat, wg, bg, wl,
                                      c, n, g, dqk)
        y = y + bl                                                 # [C, N, out]
        return jnp.transpose(y, (1, 0, 2)), None                   # [N, C, out]


def _dense_attention_impl(position_mat_t, q, k, feat, wg, bg, wl, c, n, g, dqk,
                          fused_bias=True, emb_dtype=None):
    """The dense path is HBM-bound on the [C, g, N, N] intermediates (~430 MB
    f32 round trips at C=79, N=100); the matmuls ride q.dtype (bf16 on the TPU
    fast path) to halve that traffic, while the geometric bias and the softmax
    stay f32. ``emb_dtype`` (XLA bias path only) additionally shrinks the
    [C, 64, N, N] sinusoid intermediate — see geom_bias_reference."""
    from relation_tpu.ops.pallas.geom_bias import (fused_geometric_bias,
                                                   geom_bias_reference)
    dt = q.dtype
    if fused_bias:
        bias = fused_geometric_bias(position_mat_t, wg, bg)      # [C, g, N, N]
    else:
        bias = geom_bias_reference(position_mat_t, wg, bg, emb_dtype=emb_dtype)
    qg = q.reshape(c, n, g, dqk)
    kg = k.reshape(c, n, g, dqk)
    aff = jnp.einsum("cigd,cjgd->cgij", qg, kg) / jnp.sqrt(float(dqk))
    attn = nn.softmax(aff.astype(jnp.float32) + bias, axis=-1)    # [C, g, N, N]
    av = jnp.einsum("cgij,cjf->cgif", attn.astype(dt), feat.astype(dt))
    return jnp.einsum("cgif,gfe->cige", av,
                      wl.astype(dt)).reshape(c, n, -1).astype(jnp.float32)


class _DenseParams(nn.Module):
    """Parameter holder with Dense-compatible paths (kernel/bias) for modules
    whose forward runs inside a fused kernel."""
    shape: tuple

    @nn.compact
    def __call__(self):
        k = self.param("kernel", _norm_init, self.shape)
        b = self.param("bias", nn.initializers.zeros, (self.shape[1],))
        return k, b
