"""Box geometry primitives — the jit-compatible core of the detection library.

These mirror the semantics (including the legacy ``+1`` width/height convention) of
the reference's framework-free numeric layer:
  - bbox_transform / bbox_pred / clip_boxes   (reference: lib/bbox/bbox_transform.py:74-186)
  - bbox_overlaps IoU matrix                  (reference: lib/bbox/bbox.pyx:15-55)

(The reference's index-returning ``filter_boxes`` min-size filter,
lib/bbox/bbox_transform.py:62-72, lives as a score mask inside the proposal
decoders — models/rpn.py / models/fpn.py — because planar coordinates never
materialize an [N, 4] box array there.)

All functions are pure jax.numpy over fixed shapes (no data-dependent shapes), so they
compile once under jit and vmap/shard cleanly. Invalid/padded boxes are handled by
masks rather than dynamic filtering.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_wh(boxes: jnp.ndarray):
    """Width/height under the legacy +1 convention. boxes: [..., 4] (x1,y1,x2,y2)."""
    w = boxes[..., 2] - boxes[..., 0] + 1.0
    h = boxes[..., 3] - boxes[..., 1] + 1.0
    return w, h


def box_ctr(boxes: jnp.ndarray):
    """Box centers under the legacy convention (x1 + 0.5*(w-1))."""
    w, h = box_wh(boxes)
    cx = boxes[..., 0] + 0.5 * (w - 1.0)
    cy = boxes[..., 1] + 0.5 * (h - 1.0)
    return cx, cy


def bbox_transform(ex_rois: jnp.ndarray, gt_rois: jnp.ndarray) -> jnp.ndarray:
    """Regression targets from ex_rois to gt_rois.

    Mirrors ``nonlinear_transform`` (reference lib/bbox/bbox_transform.py:74-100).
    ex_rois, gt_rois: [..., 4] -> targets [..., 4] = (dx, dy, dw, dh).
    """
    ex_w, ex_h = box_wh(ex_rois)
    ex_cx, ex_cy = box_ctr(ex_rois)
    gt_w, gt_h = box_wh(gt_rois)
    gt_cx, gt_cy = box_ctr(gt_rois)

    dx = (gt_cx - ex_cx) / (ex_w + 1e-14)
    dy = (gt_cy - ex_cy) / (ex_h + 1e-14)
    dw = jnp.log(gt_w / ex_w)
    dh = jnp.log(gt_h / ex_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def bbox_pred(boxes: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Decode deltas on top of boxes.

    Mirrors ``nonlinear_pred`` (reference lib/bbox/bbox_transform.py:103-140).
    boxes: [..., N, 4]; deltas: [..., N, 4*K] -> [..., N, 4*K]
    (K per-class delta groups, laid out x1,y1,x2,y2 repeating).
    """
    w, h = box_wh(boxes)
    cx, cy = box_ctr(boxes)

    dshape = deltas.shape
    deltas4 = deltas.reshape(dshape[:-1] + (-1, 4))  # [..., N, K, 4]
    dx, dy, dw, dh = (deltas4[..., i] for i in range(4))

    pred_cx = dx * w[..., None] + cx[..., None]
    pred_cy = dy * h[..., None] + cy[..., None]
    pred_w = jnp.exp(dw) * w[..., None]
    pred_h = jnp.exp(dh) * h[..., None]

    x1 = pred_cx - 0.5 * (pred_w - 1.0)
    y1 = pred_cy - 0.5 * (pred_h - 1.0)
    x2 = pred_cx + 0.5 * (pred_w - 1.0)
    y2 = pred_cy + 0.5 * (pred_h - 1.0)
    out = jnp.stack([x1, y1, x2, y2], axis=-1)  # [..., N, K, 4]
    return out.reshape(dshape)


def clip_boxes(boxes: jnp.ndarray, im_hw) -> jnp.ndarray:
    """Clip boxes (layout [..., 4*K]) to [0, im-1].

    Mirrors ``clip_boxes`` (reference lib/bbox/bbox_transform.py:45-60).
    im_hw: (height, width) scalars or arrays broadcastable to boxes[..., 0].
    """
    h, w = im_hw[0], im_hw[1]
    shape = boxes.shape
    b = boxes.reshape(shape[:-1] + (-1, 4))
    x1 = jnp.clip(b[..., 0], 0, w - 1)
    y1 = jnp.clip(b[..., 1], 0, h - 1)
    x2 = jnp.clip(b[..., 2], 0, w - 1)
    y2 = jnp.clip(b[..., 3], 0, h - 1)
    return jnp.stack([x1, y1, x2, y2], axis=-1).reshape(shape)


def bbox_overlaps(boxes: jnp.ndarray, query_boxes: jnp.ndarray) -> jnp.ndarray:
    """N x K IoU matrix with the +1 area convention.

    Mirrors ``bbox_overlaps_cython`` (reference lib/bbox/bbox.pyx:15-55) /
    ``bbox_overlaps_py`` (lib/bbox/bbox_transform.py:22-42).
    boxes: [N, 4], query_boxes: [K, 4] -> [N, K].
    """
    bw, bh = box_wh(boxes)
    qw, qh = box_wh(query_boxes)
    b_area = bw * bh                                   # [N]
    q_area = qw * qh                                   # [K]

    ix1 = jnp.maximum(boxes[:, None, 0], query_boxes[None, :, 0])
    iy1 = jnp.maximum(boxes[:, None, 1], query_boxes[None, :, 1])
    ix2 = jnp.minimum(boxes[:, None, 2], query_boxes[None, :, 2])
    iy2 = jnp.minimum(boxes[:, None, 3], query_boxes[None, :, 3])
    iw = jnp.maximum(ix2 - ix1 + 1.0, 0.0)
    ih = jnp.maximum(iy2 - iy1 + 1.0, 0.0)
    inter = iw * ih                                    # [N, K]
    union = b_area[:, None] + q_area[None, :] - inter
    return jnp.where(inter > 0, inter / union, 0.0)


def pairwise_iou(boxes: jnp.ndarray) -> jnp.ndarray:
    """[N, N] IoU of a box set with itself (used by on-device NMS)."""
    return bbox_overlaps(boxes, boxes)


def refine_bbox(bbox: jnp.ndarray, bbox_delta: jnp.ndarray, im_hw=None,
                means=None, stds=None) -> jnp.ndarray:
    """Decode per-class deltas into refined, optionally clipped boxes.

    In-graph equivalent of the reference's symbolic ``refine_bbox``
    (relation_rcnn/symbols/resnet_v1_101_rcnn_learn_nms_base.py:29-90), used by the
    learned-NMS head. bbox: [N, 4]; bbox_delta: [N, 4*(num_reg_classes-1)];
    returns [N, 4, num_reg_classes-1].
    """
    w, h = box_wh(bbox)
    cx, cy = box_ctr(bbox)  # NOTE reference uses 0.5*(xmin+xmax) == ctr under +1 conv

    delta = bbox_delta.reshape(bbox.shape[0], -1, 4)   # [N, K, 4]
    dx, dy, dw, dh = (delta[..., i] for i in range(4))
    if means is not None and stds is not None:
        dx = dx * stds[0] + means[0]
        dy = dy * stds[1] + means[1]
        dw = dw * stds[2] + means[2]
        dh = dh * stds[3] + means[3]

    rcx = cx[:, None] + w[:, None] * dx
    rcy = cy[:, None] + h[:, None] * dy
    rw = w[:, None] * jnp.exp(dw)
    rh = h[:, None] * jnp.exp(dh)
    x1 = rcx - 0.5 * (rw - 1.0)
    y1 = rcy - 0.5 * (rh - 1.0)
    x2 = rcx + 0.5 * (rw - 1.0)
    y2 = rcy + 0.5 * (rh - 1.0)
    out = jnp.stack([x1, y1, x2, y2], axis=1)          # [N, 4, K]
    if im_hw is not None:
        lim = jnp.stack([im_hw[1] - 1.0, im_hw[0] - 1.0,
                         im_hw[1] - 1.0, im_hw[0] - 1.0])
        out = jnp.minimum(out, lim[None, :, None])
        out = jnp.maximum(out, 0.0)
    return out
