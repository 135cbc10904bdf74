"""Loss assembly with the reference's exact scaling conventions.

Reference loss graph (symbols/..._learn_nms.py):
- RPN cls: SoftmaxOutput(normalization='valid', ignore -1)           (:272-273)
- RPN bbox: weight * smooth_l1(sigma=3) * 1/RPN_BATCH_SIZE           (:276-278)
- RCNN cls: SoftmaxOutput(normalization='valid' [, ignore -1 OHEM])  (:372-380)
- RCNN bbox: weight * smooth_l1(sigma=1) * 1/batch_rois              (:374-387)
- learned-NMS: binary CE, scale nms_loss_scale/(first_n*num_thresh),
  positive term additionally * nms_pos_scale (grad_scale)            (:539-551)

MakeLoss(grad_scale=s) in MXNet scales the gradient by s; minimizing the weighted
sum below reproduces those gradients. ``normalization='valid'`` divides by the count
of non-ignored rows, i.e. a mean over valid entries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """MXNet smooth_l1 with ``scalar=sigma``: 0.5*(sigma*x)^2 if |x| < 1/sigma^2
    else |x| - 0.5/sigma^2."""
    s2 = sigma * sigma
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0 / s2, 0.5 * s2 * x * x, ax - 0.5 / s2)


def softmax_ce_valid(logits: jnp.ndarray, labels: jnp.ndarray):
    """Cross-entropy, mean over labels >= 0 (ignore label -1).
    Returns (loss, num_valid)."""
    valid = labels >= 0
    safe = jnp.clip(labels, 0, logits.shape[-1] - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    num = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    return jnp.sum(jnp.where(valid, nll, 0.0)) / num, num


def rpn_losses(rpn_cls_logits: jnp.ndarray, rpn_bbox_pred: jnp.ndarray,
               label: jnp.ndarray, bbox_target: jnp.ndarray,
               bbox_weight: jnp.ndarray, rpn_batch_size: int,
               sigma: float = 3.0):
    """rpn_cls_logits: [K, 2] (K = h*w*A, (h,w,a)-major); label: [K] in {-1,0,1};
    bbox_*: [K, 4]."""
    cls_loss, _ = softmax_ce_valid(rpn_cls_logits, label)
    l1 = bbox_weight * smooth_l1(rpn_bbox_pred - bbox_target, sigma)
    bbox_loss = jnp.sum(l1) / rpn_batch_size
    return cls_loss, bbox_loss


def rcnn_losses(cls_score: jnp.ndarray, bbox_pred: jnp.ndarray,
                label: jnp.ndarray, bbox_target: jnp.ndarray,
                bbox_weight: jnp.ndarray, bbox_norm: float):
    """cls_score: [R, C]; label: [R] (-1 ignored); bbox_norm = BATCH_ROIS_OHEM or
    the reference's batch_rois_num (300 when BATCH_ROIS < 0)."""
    cls_loss, _ = softmax_ce_valid(cls_score, label)
    l1 = bbox_weight * smooth_l1(bbox_pred - bbox_target, 1.0)
    bbox_loss = jnp.sum(l1) / bbox_norm
    return cls_loss, bbox_loss


def learn_nms_losses(nms_multi_score: jnp.ndarray, nms_multi_target: jnp.ndarray,
                     nms_loss_scale: float, nms_pos_scale: float,
                     eps: float = 1e-8):
    """Binary CE split into pos/neg terms (reference :539-551). Shapes [F, C, T]."""
    first_n, _, num_thresh = nms_multi_score.shape
    normalizer = first_n * num_thresh
    # clamp STRICTLY below 1: softmax*sigmoid saturates to exactly 1.0f, and
    # XLA's algebraic simplifier reassociates (1 - s) + eps into (1 + eps) - s
    # where 1 + 1e-8 constant-folds back to 1.0f — log(0) = -inf, and entries
    # with target==1 then hit 0 * -inf = NaN (observed at overfit step ~394,
    # jit-only; the eager left-to-right evaluation is finite). A 1e-7 ceiling
    # keeps 1 - s >= 1e-7 under ANY association; the saturated-entry loss
    # shifts log(1e-8) -> log(1.1e-7) (−18.4 -> −16.0), irrelevant to training
    # and unreachable for calibrated scores.
    s = jnp.clip(nms_multi_score, 0.0, 1.0 - 1e-7)
    pos = -nms_multi_target * jnp.log(s + eps)
    neg = -(1.0 - nms_multi_target) * jnp.log(1.0 - s + eps)
    pos_loss = nms_loss_scale * jnp.sum(pos) / normalizer
    neg_loss = nms_loss_scale * jnp.sum(neg) / normalizer
    total = nms_pos_scale * pos_loss + neg_loss
    return total, pos_loss, neg_loss


def accuracy_ignore(logits: jnp.ndarray, labels: jnp.ndarray):
    """Valid-normalized accuracy (reference core/metric.py RCNNAccMetric)."""
    pred = jnp.argmax(logits, axis=-1)
    valid = labels >= 0
    num = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    return jnp.sum(jnp.where(valid, (pred == labels).astype(jnp.float32), 0.0)) / num


def nms_accuracy(nms_multi_score: jnp.ndarray, nms_multi_target: jnp.ndarray):
    """Pos/neg accuracy of the conditional score at 0.5
    (reference core/metric.py NMSAccMetric)."""
    pred_pos = nms_multi_score > 0.5
    pos_mask = nms_multi_target > 0.5
    num_pos = jnp.maximum(jnp.sum(pos_mask.astype(jnp.float32)), 1.0)
    num_neg = jnp.maximum(jnp.sum((~pos_mask).astype(jnp.float32)), 1.0)
    acc_pos = jnp.sum(jnp.where(pos_mask, pred_pos, False).astype(jnp.float32)) / num_pos
    acc_neg = jnp.sum(jnp.where(~pos_mask, ~pred_pos, False).astype(jnp.float32)) / num_neg
    return acc_pos, acc_neg
