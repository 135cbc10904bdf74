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

from relation_tpu.ops import bbox_pred, clip_boxes, filter_boxes_mask
from relation_tpu.ops.nms import greedy_nms_topk

_NEG_INF = -1e10


class RPNHead(nn.Module):
    """rpn_conv_3x3 -> relu -> {rpn_cls_score, rpn_bbox_pred}."""
    num_anchors: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feat):
        a = self.num_anchors
        x = nn.Conv(512, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    param_dtype=jnp.float32, name="rpn_conv_3x3")(feat)
        x = nn.relu(x)
        cls = nn.Conv(2 * a, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                      name="rpn_cls_score")(x)
        bbox = nn.Conv(4 * a, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                       name="rpn_bbox_pred")(x)
        h, w = cls.shape[-3], cls.shape[-2]
        cls = cls.reshape(cls.shape[:-1] + (a, 2)).astype(jnp.float32)
        bbox = bbox.reshape(bbox.shape[:-1] + (a, 4)).astype(jnp.float32)
        return cls, bbox   # [..., H, W, A, 2], [..., H, W, A, 4]


def generate_proposals(fg_prob: jnp.ndarray, deltas: jnp.ndarray,
                       anchors: jnp.ndarray, im_info: jnp.ndarray,
                       feat_stride: int, pre_nms_top_n: int, post_nms_top_n: int,
                       nms_thresh: float, min_size: float):
    """Decode + NMS one image's RPN output into post_nms_top_n rois.

    fg_prob: [H, W, A] foreground probabilities; deltas: [H, W, A, 4];
    anchors: [H*W*A, 4] grid from shift_anchors; im_info: [3] (h, w, scale) of the
    *unpadded* image inside the fixed bucket.

    Returns (rois [post_N, 4], scores [post_N], real_mask [post_N]).

    Mirrors operator_py/proposal.py:69-165, with the dynamic filters turned into
    score masks: anchors on padded feature cells (the reference crops the map at
    int(im/stride), proposal.py:85+115) and boxes under min_size (proposal.py:134)
    are pushed to -inf score instead of being dropped.
    """
    H, W, A = fg_prob.shape
    scores = fg_prob.reshape(-1)
    deltas = deltas.reshape(-1, 4)

    proposals = bbox_pred(anchors, deltas)
    proposals = clip_boxes(proposals, (im_info[0], im_info[1]))

    # mask: feature cells within the valid (unpadded) region
    valid_h = jnp.floor(im_info[0] / feat_stride).astype(jnp.int32)
    valid_w = jnp.floor(im_info[1] / feat_stride).astype(jnp.int32)
    cell_ok = ((jnp.arange(H)[:, None] < valid_h) &
               (jnp.arange(W)[None, :] < valid_w))
    cell_ok = jnp.broadcast_to(cell_ok[:, :, None], (H, W, A)).reshape(-1)

    size_ok = filter_boxes_mask(proposals, min_size * im_info[2])
    ok = cell_ok & size_ok
    masked = jnp.where(ok, scores, _NEG_INF)

    k = min(pre_nms_top_n, masked.shape[0])
    top_scores, top_idx = jax.lax.top_k(masked, k)
    top_boxes = proposals[top_idx]
    top_valid = top_scores > _NEG_INF / 2

    keep_idx, real = greedy_nms_topk(top_boxes, top_scores, nms_thresh,
                                     post_nms_top_n, valid=top_valid)
    rois = top_boxes[keep_idx]
    roi_scores = top_scores[keep_idx]
    return rois, roi_scores, real
