"""Learned NMS ("duplicate removal") head.

Replaces greedy NMS with a rank-embedding + relation-attention network producing a
per-(box, class, IoU-threshold) duplicate-or-not conditional score.

Mirrors the reference train graph (symbols/..._learn_nms.py:412-551) and the
inference-only fused op (operator_py/learn_nms.py:219-405). The reference inference
op dynamically filters classes whose max score is below ``class_thresh`` to shrink
the attention batch (learn_nms.py:296-309) — a host-sync micro-optimization that is
unnecessary on TPU: here every class rides through fixed shapes ([first_n, 80] is
tiny for the MXU).

Gradient-flow parity (symbols/..._learn_nms.py):
- bbox_pred is BlockGrad'd before refine_bbox (:428)  -> stop_gradient here
- sorted_score is *not* blocked (:499-501 commented out) -> gradients flow into the
  classifier through the multiplicative score fusion.

Parameter names (nms_rank, roi_feat_embedding, nms_logit, nms_* attention) match the
reference arg names; nms_logit bias is initialized to -3.0 (:600).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from relation_tpu.ops.boxes import refine_bbox
from relation_tpu.ops.embeddings import (extract_rank_embedding,
                                         extract_multi_position_matrix_t)
from relation_tpu.models.relation import NMSRelationModule

_norm_init = nn.initializers.normal(0.01)


class LearnNMSHead(nn.Module):
    """Duplicate-removal head.

    __call__(cls_score [N, num_classes], bbox_pred [N, 4*num_reg_classes],
             rois [N, 4], roi_feat [N, 1024], im_info [3])
    with N = nongt_dim (gt rows already sliced off by the caller).

    Returns dict with:
      nms_multi_score   [first_n, num_fg_classes, num_thresh]
      sorted_bbox       [first_n, num_fg_classes, 4]
      sorted_score      [first_n, num_fg_classes]
      nms_conditional_score  same shape as nms_multi_score
    """
    num_fg_classes: int
    first_n: int
    num_thresh: int
    class_agnostic: bool = True
    bbox_means: tuple | None = None
    bbox_stds: tuple | None = None
    dtype: Any = jnp.float32
    # compute dtype for the NMS relation attention matmuls (bf16 on the TPU
    # fast path; the geometric bias, softmax, and logit layer stay f32)
    attn_dtype: Any = jnp.float32
    allow_pallas: bool = True   # False = pure-XLA attention (FPN; see relation.py)
    geom_emb_dtype: Any = None  # XLA dense path: sinusoid dtype (see geom_bias)
    compact_classes: int = 32   # XLA path: active-class gather cap (relation.py)

    @nn.compact
    def __call__(self, cls_score, bbox_pred, rois, roi_feat, im_info,
                 class_thresh: float = 0.0, probe: str = ""):
        """``class_thresh``: inference-time valid-class filter (reference
        operator_py/learn_nms.py:296-309 + TEST.LEARN_NMS_CLASS_SCORE_TH=0.01):
        classes whose best score falls below min(class_thresh, global best)
        get conditional score 0 — exactly the reference's restore-with-zeros
        layout (learn_nms.py:366-377). 0.0 (training / default) disables it;
        the reference train graph computes every class.

        ``probe``: benchmarking cut inside the head ('embed' = stop after the
        sort/gather/rank+roi embeddings, 'attn' = stop after the relation
        attention; tools/microbench_train_cuts.py lnms_embed/lnms_attn) —
        returns the same dict with the uncut tails replaced by cheap
        projections of the cut point so callers stay shape-compatible."""
        C = self.num_fg_classes
        F = self.first_n

        bbox_pred = jax.lax.stop_gradient(bbox_pred)
        # drop the background regression group (reference :434 slices [4:])
        bbox_delta_nobg = bbox_pred[:, 4:]
        # refined_bbox: [N, 4, num_reg_classes-1]
        refined = refine_bbox(rois, bbox_delta_nobg, im_hw=(im_info[0], im_info[1]),
                              means=self.bbox_means, stds=self.bbox_stds)

        cls_prob = jax.nn.softmax(cls_score, axis=-1)
        prob_nobg = cls_prob[:, 1:]                               # [N, C]

        # per-class descending sort; take first_n (reference :442-449).
        # EVERY rank gather is a one-hot contraction, forward AND backward:
        # numerically exact (0/1 weights, single-term sums), and under the
        # train step's vmap a gather forward lowers to TPU batched-gather
        # (the r5 deform cliff: serialized row loops) while these are
        # batched MXU matmuls. The backward-only form lived in
        # ops/gathers.py (0.68 ms scatter -> matmul, round 3); r5 moved the
        # forward too (the learn_nms.apply stage measured 2.01 ms/img of
        # the B=8 train forward).
        rank_idx = jnp.argsort(-prob_nobg, axis=0)[:F]            # [F, C]
        rank_oh = jax.nn.one_hot(rank_idx, prob_nobg.shape[0],
                                 dtype=jnp.float32)               # [F, C, N]
        sorted_score = jnp.einsum("fcn,nc->fc", rank_oh, prob_nobg)

        if self.class_agnostic:
            # refined[:, :, 0] gathered per class: [F, C, 4]
            sorted_bbox = jnp.einsum("fcn,nk->fck", rank_oh, refined[:, :, 0])
        else:
            # pick each class's own regression group: contract n, align c
            refined_cls = jnp.transpose(refined, (0, 2, 1))       # [N, K, 4]
            sorted_bbox = jnp.einsum("fcn,nck->fck", rank_oh,
                                     refined_cls[:, :C, :])

        # rank embedding -> 128 (reference :462-465)
        rank_emb = extract_rank_embedding(F, 1024)
        rank_feat = nn.Dense(128, name="nms_rank", dtype=self.dtype,
                             kernel_init=_norm_init)(rank_emb)    # [F, 128]

        # per-class pairwise geometry (reference :467), field-major for the
        # fused Pallas geometric-bias kernel
        nms_position_matrix_t = extract_multi_position_matrix_t(sorted_bbox)

        # roi feature embedding -> 128, gathered in rank order (reference :469-474)
        roi_emb = nn.Dense(128, name="roi_feat_embedding", dtype=self.dtype,
                           kernel_init=_norm_init)(roi_feat)      # [N, 128]
        sorted_roi_feat = jnp.einsum(
            "fcn,nd->fcd", rank_oh, roi_emb.astype(jnp.float32))  # [F, C, 128]

        nms_embedding_feat = sorted_roi_feat + rank_feat[:, None, :]
        if probe == "embed":
            # cut: everything through the embeddings (sort, one-hot gathers,
            # geometry matrix, rank/roi FCs); attention + logit skipped
            s = (1e-30 * (jnp.sum(nms_embedding_feat) +
                          jnp.sum(nms_position_matrix_t)))
            z = jnp.zeros((F, C, self.num_thresh)) + s
            return {"nms_multi_score": sorted_score[..., None] + z,
                    "sorted_bbox": sorted_bbox, "sorted_score": sorted_score,
                    "nms_conditional_score": z}

        # inference-time valid-class filter (reference learn_nms.py:296-309):
        # classes below min(class_thresh, global best) skip both attention
        # kernel stages entirely and get conditional score exactly 0
        active_f = None
        if class_thresh > 0.0:
            max_per_class = sorted_score.max(axis=0)              # [C]
            thr = jnp.minimum(class_thresh, max_per_class.max())
            active_f = max_per_class >= thr

        attention, _ = NMSRelationModule(index=1, groups=16, dim_qk=1024,
                                         dim_out=128, dtype=self.attn_dtype,
                                         allow_pallas=self.allow_pallas,
                                         geom_emb_dtype=self.geom_emb_dtype,
                                         compact_classes=self.compact_classes)(
            nms_embedding_feat, nms_position_matrix_t,
            active=None if active_f is None else active_f.astype(jnp.int32))
        feat = nn.relu(nms_embedding_feat + attention)            # [F, C, 128]
        if probe == "attn":
            # cut: through the relation attention; logit layer skipped
            s = 1e-30 * jnp.sum(feat)
            z = jnp.zeros((F, C, self.num_thresh)) + s
            return {"nms_multi_score": sorted_score[..., None] + z,
                    "sorted_bbox": sorted_bbox, "sorted_score": sorted_score,
                    "nms_conditional_score": z}

        logit = nn.Dense(self.num_thresh, name="nms_logit", dtype=self.dtype,
                         kernel_init=_norm_init,
                         bias_init=nn.initializers.constant(-3.0))(feat)
        conditional = jax.nn.sigmoid(logit)                       # [F, C, T]
        if active_f is not None:
            # where(), not multiply: skipped classes' logits are garbage and
            # may be NaN — 0 * NaN would poison the scores
            conditional = jnp.where(active_f[None, :, None], conditional, 0.0)
        nms_multi_score = sorted_score[..., None] * conditional

        return {
            "nms_multi_score": nms_multi_score,
            "sorted_bbox": sorted_bbox,
            "sorted_score": sorted_score,
            "nms_conditional_score": conditional,
        }


def merge_multi_score(nms_multi_score: jnp.ndarray, merge_method: int) -> jnp.ndarray:
    """Test-time merge over the threshold axis (reference :553-562):
    -1 mean, -2 max, 0<=i<T pick index."""
    if merge_method == -1:
        return nms_multi_score.mean(axis=2)
    if merge_method == -2:
        return nms_multi_score.max(axis=2)
    if 0 <= merge_method < nms_multi_score.shape[2]:
        return nms_multi_score[:, :, merge_method]
    raise NotImplementedError(f"Unknown merge method {merge_method}.")
