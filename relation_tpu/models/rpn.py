"""RPN head + fully on-device proposal generation.

Reference equivalents:
- RPN head: 3x3/512 conv + 1x1 cls (2A) + 1x1 bbox (4A)
  (relation_rcnn/symbols/resnet_v1_101_rcnn_base.py:685-693).
- Proposal op: anchor grid, delta decode, clip, min-size filter, score sort,
  pre-NMS top-N, greedy NMS, post-NMS top-N with padding
  (relation_rcnn/operator_py/proposal.py:51-168) — a host round trip with a GPU NMS
  call in the reference; here a single static-shape jit region.

Layout notes: everything is NHWC. Logits come out as [..., H, W, A, 2] so the
fg/bg softmax is a plain last-axis softmax; delta layout [H, W, A, 4] flattened
(h, w, a)-major matches the anchor grid from ops.anchors.shift_anchors (and thereby
the reference's NCHW transpose dance at proposal.py:110-124).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from relation_tpu.ops.nms import nms_topk_presorted

_NEG_INF = -1e10


class RPNHead(nn.Module):
    """rpn_conv_3x3 -> relu -> {rpn_cls_score, rpn_bbox_pred}."""
    num_anchors: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feat, raw: bool = False):
        a = self.num_anchors
        x = nn.Conv(512, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    param_dtype=jnp.float32, name="rpn_conv_3x3")(feat)
        x = nn.relu(x)
        cls = nn.Conv(2 * a, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                      name="rpn_cls_score")(x)
        bbox = nn.Conv(4 * a, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                       name="rpn_bbox_pred")(x)
        if raw:
            # conv layouts [..., H, W, 2A] / [..., H, W, 4A], channel c = a*2+j
            # (bg, fg) resp. a*4+j (dx, dy, dw, dh) — the [..., A, 2] reshape
            # below lane-pads 2 -> 128 on TPU (64x HBM waste, ruinous on the
            # big FPN stride-4/8 levels); planar consumers slice channels from
            # a [C, H, W] transpose instead (models/fpn.py decode)
            return cls, bbox
        cls = cls.reshape(cls.shape[:-1] + (a, 2)).astype(jnp.float32)
        bbox = bbox.reshape(bbox.shape[:-1] + (a, 4)).astype(jnp.float32)
        return cls, bbox   # [..., H, W, A, 2], [..., H, W, A, 4]


def generate_proposals(fg_prob: jnp.ndarray, deltas: jnp.ndarray,
                       base_anchors: jnp.ndarray, im_info: jnp.ndarray,
                       feat_stride: int, pre_nms_top_n: int, post_nms_top_n: int,
                       nms_thresh: float, min_size: float):
    """Decode + NMS one image's RPN output into post_nms_top_n rois.

    fg_prob: [H, W, A] foreground probabilities; deltas: [H, W, A, 4];
    base_anchors: [A, 4] from ops.anchors.generate_anchors; im_info: [3]
    (h, w, scale) of the *unpadded* image inside the fixed bucket.

    Returns (rois [post_N, 4], scores [post_N], real_mask [post_N]).

    Mirrors operator_py/proposal.py:69-165, with the dynamic filters turned into
    score masks: anchors on padded feature cells (the reference crops the map at
    int(im/stride), proposal.py:85+115) and boxes under min_size (proposal.py:134)
    are pushed to -inf score instead of being dropped.

    TPU layout note: the decode runs entirely on dense [N] coordinate vectors in
    (a, h, w) flatten order — an [N, 4] tensor is lane-padded 4->128 on TPU
    (37 MB at N=73728), and the previous formulation that materialized the full
    decoded [N, 4] grid spent ~0.7 ms/image on that padding traffic. The anchor
    grid is likewise built as broadcasted [A, H, W] planes instead of the
    [N, 4] shift_anchors grid. Only the top-pre_nms_top_n boxes are ever
    assembled as [k, 4]. (The (a, h, w) order differs from the reference's
    (h, w, a) only in tie-breaking among exactly-equal scores.)
    """
    H, W, A = fg_prob.shape
    scores = fg_prob.transpose(2, 0, 1).reshape(-1)            # (a, h, w)
    d = deltas.transpose(2, 3, 0, 1)                           # [A, 4, H, W]
    dx = d[:, 0].reshape(-1)
    dy = d[:, 1].reshape(-1)
    dw = d[:, 2].reshape(-1)
    dh = d[:, 3].reshape(-1)

    # anchor grid as dense [A, H, W] planes (broadcast, never [N, 4])
    sx = jnp.arange(W, dtype=jnp.float32)[None, None, :] * feat_stride
    sy = jnp.arange(H, dtype=jnp.float32)[None, :, None] * feat_stride
    zero = jnp.zeros((A, H, W), jnp.float32)
    ax1 = (base_anchors[:, 0][:, None, None] + sx + zero).reshape(-1)
    ay1 = (base_anchors[:, 1][:, None, None] + sy + zero).reshape(-1)
    ax2 = (base_anchors[:, 2][:, None, None] + sx + zero).reshape(-1)
    ay2 = (base_anchors[:, 3][:, None, None] + sy + zero).reshape(-1)

    # decode (nonlinear_pred semantics, lib/bbox/bbox_transform.py:103-140)
    aw = ax2 - ax1 + 1.0
    ah = ay2 - ay1 + 1.0
    acx = ax1 + 0.5 * (aw - 1.0)
    acy = ay1 + 0.5 * (ah - 1.0)
    pcx = dx * aw + acx
    pcy = dy * ah + acy
    pw = jnp.exp(dw) * aw
    ph = jnp.exp(dh) * ah
    x1 = jnp.clip(pcx - 0.5 * (pw - 1.0), 0, im_info[1] - 1)
    y1 = jnp.clip(pcy - 0.5 * (ph - 1.0), 0, im_info[0] - 1)
    x2 = jnp.clip(pcx + 0.5 * (pw - 1.0), 0, im_info[1] - 1)
    y2 = jnp.clip(pcy + 0.5 * (ph - 1.0), 0, im_info[0] - 1)

    # masks: feature cells within the valid (unpadded) region; min-size filter
    valid_h = jnp.floor(im_info[0] / feat_stride).astype(jnp.int32)
    valid_w = jnp.floor(im_info[1] / feat_stride).astype(jnp.int32)
    cell_ok = ((jnp.arange(H)[None, :, None] < valid_h) &
               (jnp.arange(W)[None, None, :] < valid_w))
    cell_ok = jnp.broadcast_to(cell_ok, (A, H, W)).reshape(-1)
    ms = min_size * im_info[2]
    size_ok = ((x2 - x1 + 1.0) >= ms) & ((y2 - y1 + 1.0) >= ms)
    masked = jnp.where(cell_ok & size_ok, scores, _NEG_INF)

    k = min(pre_nms_top_n, masked.shape[0])
    top_scores, top_idx = jax.lax.top_k(masked, k)
    # planar [4, k]: the [k, 4] layout would lane-pad 4->128 on TPU, and the
    # NMS kernel consumes the planar form directly
    top_bT = jnp.stack([x1[top_idx], y1[top_idx],
                        x2[top_idx], y2[top_idx]], axis=0)     # [4, k]
    top_valid = top_scores > _NEG_INF / 2

    # top_k output is descending -> presorted single-launch NMS sweep
    keep_idx, real = nms_topk_presorted(top_bT, top_scores, top_valid,
                                        nms_thresh, post_nms_top_n)
    rois = top_bT[:, keep_idx].T                               # [post_N, 4]
    roi_scores = top_scores[keep_idx]
    return rois, roi_scores, real
