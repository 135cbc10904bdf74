"""On-device training-target assignment.

Replaces the reference's host round-trip CustomOps with jit-compatible, static-shape
computations (per-image; vmap over the batch):

- anchor_targets     <- lib/rpn/rpn.py:80-243 (assign_anchor)
- sample_rois        <- operator_py/proposal_target.py:30-143 + core/rcnn.py:369-398
- ohem_select        <- operator_py/box_annotator_ohem.py:19-86
- nms_multi_target   <- operator_py/nms_multi_target.py:18-112

Dynamic-size index sets become rank tricks over random priorities: "sample k of the
eligible without replacement" = "keep the k best random priorities among eligible" —
identical in distribution to npr.choice(..., replace=False).

Ground-truth boxes arrive padded to a fixed MAX_GT with a validity mask; padded rows
are excluded by masking, and padded ROI rows get label -1 (ignored by the
valid-normalized losses), preserving the reference's loss normalization over real rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from relation_tpu.ops.boxes import bbox_overlaps, bbox_transform

_NEG = -1e9


def _keep_top(mask: jnp.ndarray, priority: jnp.ndarray, cap, k_max: int
              ) -> jnp.ndarray:
    """True for the `cap` highest-`priority` elements among `mask` (all of them
    if fewer). ``cap`` may be traced but must be <= static ``k_max``.

    Equivalent to rank-among-masked < cap, but top_k + a <=k_max-element
    scatter instead of a full argsort + K-element scatter — the K-wide rank
    scatter was 187 us at K=22k (C4) and far worse at the 622k FPN pyramid;
    top_k(256) is 40 us. Ties: top_k prefers the earlier index, exactly like a
    stable descending argsort, so the selected set is unchanged."""
    key = jnp.where(mask, priority, _NEG)
    k_max = min(int(k_max), key.shape[0])
    _, idx = jax.lax.top_k(key, k_max)
    keep = jnp.zeros(mask.shape, bool).at[idx].set(
        jnp.arange(k_max) < cap, mode="drop", unique_indices=True)
    return keep & mask


def anchor_targets(anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
                   gt_valid: jnp.ndarray, im_info: jnp.ndarray, rng: jax.Array,
                   rpn_batch_size: int = 256, fg_fraction: float = 0.5,
                   positive_overlap: float = 0.7, negative_overlap: float = 0.3,
                   clobber_positives: bool = False, allowed_border: float = 0.0,
                   bbox_weights=(1.0, 1.0, 1.0, 1.0)):
    """RPN anchor label/target assignment for one image, on device.

    anchors: [K, 4] full grid; gt_boxes: [G, 5] (x1,y1,x2,y2,cls) padded;
    gt_valid: [G] bool; im_info: [3].
    Returns (label [K] in {-1,0,1}, bbox_target [K,4], bbox_weight [K,4]).
    """
    K = anchors.shape[0]
    inside = ((anchors[:, 0] >= -allowed_border) &
              (anchors[:, 1] >= -allowed_border) &
              (anchors[:, 2] < im_info[1] + allowed_border) &
              (anchors[:, 3] < im_info[0] + allowed_border))

    num_gt = jnp.sum(gt_valid.astype(jnp.int32))
    overlaps = bbox_overlaps(anchors, gt_boxes[:, :4])          # [K, G]
    overlaps = jnp.where(gt_valid[None, :], overlaps, -1.0)
    overlaps = jnp.where(inside[:, None], overlaps, -1.0)

    argmax_overlaps = jnp.argmax(overlaps, axis=1)              # [K]
    max_overlaps = jnp.max(overlaps, axis=1)
    max_overlaps = jnp.maximum(max_overlaps, 0.0)               # -1 rows -> 0
    gt_max = jnp.max(overlaps, axis=0)                          # [G]
    # anchors achieving a per-gt max (reference rpn.py:169-171 uses equality over
    # the whole matrix, catching ties)
    is_gt_best = jnp.any((overlaps == gt_max[None, :]) & gt_valid[None, :]
                         & (gt_max[None, :] > 0), axis=1)

    label = jnp.full((K,), -1, dtype=jnp.int32)
    neg = max_overlaps < negative_overlap
    pos = is_gt_best | (max_overlaps >= positive_overlap)
    if clobber_positives:
        label = jnp.where(pos, 1, label)
        label = jnp.where(neg, 0, label)
    else:
        label = jnp.where(neg, 0, label)
        label = jnp.where(pos, 1, label)
    label = jnp.where(inside, label, -1)
    # no gt at all -> all inside anchors are background (rpn.py:185-186)
    label = jnp.where((num_gt == 0) & inside, 0, label)

    # subsample
    k_fg, k_bg = jax.random.split(rng)
    num_fg_cap = int(fg_fraction * rpn_batch_size)
    fg_mask = label == 1
    fg_keep = _keep_top(fg_mask, jax.random.uniform(k_fg, (K,)),
                        num_fg_cap, num_fg_cap)
    label = jnp.where(fg_mask & ~fg_keep, -1, label)

    num_fg_kept = jnp.sum((label == 1).astype(jnp.int32))
    num_bg_cap = rpn_batch_size - num_fg_kept
    bg_mask = label == 0
    bg_keep = _keep_top(bg_mask, jax.random.uniform(k_bg, (K,)),
                        num_bg_cap, rpn_batch_size)
    label = jnp.where(bg_mask & ~bg_keep, -1, label)

    # gt_boxes[argmax_overlaps, :4] as a one-hot matmul: the [K]-row dynamic
    # gather from the tiny [G, 4] table was 646 us of the op's 790 us on the
    # TPU (tools/microbench_anchor_targets.py --cuts); onehot [K, G] @ [G, 4]
    # is exact (rows of 1.0*x) and rides the MXU in ~tens of us
    onehot = (argmax_overlaps[:, None] ==
              jnp.arange(gt_boxes.shape[0])[None, :]).astype(jnp.float32)
    matched_gt = onehot @ gt_boxes[:, :4]
    target = bbox_transform(anchors, matched_gt)
    target = jnp.where((num_gt > 0) & (label[:, None] == 1), target, 0.0)
    weight = jnp.where(label[:, None] == 1,
                       jnp.asarray(bbox_weights, dtype=jnp.float32)[None, :], 0.0)
    return label, target, weight


def expand_bbox_targets(labels: jnp.ndarray, targets: jnp.ndarray,
                        num_reg_classes: int, bbox_weights=(1.0, 1.0, 1.0, 1.0)):
    """[R] labels + [R, 4] targets -> one-hot-expanded [R, 4*num_reg_classes]
    targets/weights (reference lib/bbox/bbox_regression.py:117-140; class-agnostic
    puts every fg in group 1)."""
    R = labels.shape[0]
    if num_reg_classes == 2:
        group = jnp.where(labels > 0, 1, 0)
    else:
        group = jnp.clip(labels, 0, num_reg_classes - 1)
    onehot = jax.nn.one_hot(group, num_reg_classes, dtype=jnp.float32)  # [R, Krc]
    fg = (labels > 0).astype(jnp.float32)[:, None, None]
    expanded = (onehot[:, :, None] * targets[:, None, :] * fg)
    w = jnp.asarray(bbox_weights, dtype=jnp.float32)
    weights = onehot[:, :, None] * w[None, None, :] * fg
    return expanded.reshape(R, -1), weights.reshape(R, -1)


def sample_rois(rois: jnp.ndarray, roi_valid: jnp.ndarray, gt_boxes: jnp.ndarray,
                gt_valid: jnp.ndarray, rng: jax.Array, *,
                batch_rois: int, num_reg_classes: int, fg_fraction: float = 0.25,
                fg_thresh: float = 0.5, bg_thresh_hi: float = 0.5,
                bg_thresh_lo: float = 0.0, bbox_normalize: bool = False,
                bbox_means=(0., 0., 0., 0.), bbox_stds=(0.1, 0.1, 0.2, 0.2),
                bbox_weights=(1.0, 1.0, 1.0, 1.0), pad_mode: str = "repeat"):
    """proposal_target: append gt rois, FG/BG-sample (or take all), emit targets.

    rois: [R, 4] proposals (padding allowed, flagged by roi_valid); gt padded [G, 5].
    Take-all mode (batch_rois < 0, reference proposal_target.py:50-61 /
    core/rcnn.py sample_rois_v2) keeps everything: output size R + G.
    Sampled mode outputs exactly batch_rois rows.

    ``pad_mode`` governs how the fixed minibatch is filled when fg+bg fall
    short (reference core/rcnn.py:369-373: ``npr.choice(range(len(rois)),
    gap, replace=False)`` — a fresh draw over ALL rois, so already-selected
    rois can repeat, each labeled by its own overlap with the
    ``overlap < BG_THRESH_HI -> background`` rule of rcnn.py:380-382):
      'repeat'   faithful gap sampling over the full roi set (default)
      'distinct' only-unselected pad pool (strictly more distinct rois per
                 minibatch; kept for experimentation)

    Returns dict(rois [S,4], label [S] (-1 ignore), bbox_target [S, 4*Krc],
                 bbox_weight [S, 4*Krc]) with S = R+G or batch_rois.
    """
    R = rois.shape[0]
    G = gt_boxes.shape[0]
    all_rois = jnp.concatenate([rois, gt_boxes[:, :4]], axis=0)     # [R+G, 4]
    all_valid = jnp.concatenate([roi_valid, gt_valid], axis=0)

    num_gt = jnp.sum(gt_valid.astype(jnp.int32))
    overlaps = bbox_overlaps(all_rois, gt_boxes[:, :4])             # [R+G, G]
    overlaps = jnp.where(gt_valid[None, :], overlaps, -1.0)
    gt_assignment = jnp.argmax(overlaps, axis=1)
    max_overlaps = jnp.maximum(jnp.max(overlaps, axis=1), 0.0)
    raw_label = gt_boxes[gt_assignment, 4].astype(jnp.int32)

    fg = all_valid & (max_overlaps >= fg_thresh) & (num_gt > 0)
    bg = all_valid & (max_overlaps < bg_thresh_hi) & (max_overlaps >= bg_thresh_lo)
    label = jnp.where(fg, raw_label, jnp.where(bg, 0, -1))

    if batch_rois < 0:
        sel_rois, sel_label = all_rois, label
        sel_assignment, sel_fg = gt_assignment, fg
    else:
        k_fg, k_bg, k_pad, k_gap = jax.random.split(rng, 4)
        fg_cap = int(round(fg_fraction * batch_rois))
        fg_sel = _keep_top(fg, jax.random.uniform(k_fg, (R + G,)),
                           fg_cap, fg_cap)
        n_fg = jnp.sum(fg_sel.astype(jnp.int32))
        bg_sel = _keep_top(bg, jax.random.uniform(k_bg, (R + G,)),
                           batch_rois - n_fg, batch_rois)
        n_keep = n_fg + jnp.sum(bg_sel.astype(jnp.int32))
        # ordering key: selected fg(0) < selected bg(1) < rest(2); random within
        key = jnp.where(fg_sel, 0, jnp.where(bg_sel, 1, 2)).astype(jnp.float32)
        key = key + jax.random.uniform(k_pad, (R + G,)) * 0.5
        key = jnp.where(all_valid, key, 1e6)      # padded rows last
        sel_order = jnp.argsort(key)
        if pad_mode == "repeat":
            # gap rows: an independent uniform draw over ALL valid rois
            # (rcnn.py:371 npr.choice over range(len(rois)) — selected rois may
            # repeat in the minibatch)
            gap_key = jnp.where(all_valid,
                                jax.random.uniform(k_gap, (R + G,)), 1e6)
            gap_perm = jnp.argsort(gap_key)
            p = jnp.arange(batch_rois)
            order = jnp.where(p < n_keep, sel_order[p],
                              gap_perm[jnp.clip(p - n_keep, 0, R + G - 1)])
        else:
            order = sel_order[:batch_rois]
        sel_rois = all_rois[order]
        raw = label[order]
        # gap rows are labeled by their own overlap: class iff
        # overlap >= BG_THRESH_HI, else background (rcnn.py:380-382)
        sel_label = jnp.where(raw == -1,
                              jnp.where(max_overlaps[order] >= bg_thresh_hi,
                                        raw_label[order], 0), raw)
        sel_label = jnp.where(all_valid[order], sel_label, -1)
        sel_assignment = gt_assignment[order]
        sel_fg = sel_label > 0

    targets = bbox_transform(sel_rois, gt_boxes[sel_assignment, :4])
    if bbox_normalize:
        targets = (targets - jnp.asarray(bbox_means)) / jnp.asarray(bbox_stds)
    targets = jnp.where((num_gt > 0) & sel_fg[:, None], targets, 0.0)
    bbox_target, bbox_weight = expand_bbox_targets(
        jnp.where(sel_fg, sel_label, 0), targets, num_reg_classes, bbox_weights)
    return {"rois": sel_rois, "label": sel_label,
            "bbox_target": bbox_target, "bbox_weight": bbox_weight}


def ohem_select(cls_score: jnp.ndarray, bbox_pred: jnp.ndarray, label: jnp.ndarray,
                bbox_target: jnp.ndarray, bbox_weight: jnp.ndarray,
                roi_per_img: int):
    """Online hard example mining: keep the roi_per_img highest-loss ROIs.

    Mirrors BoxAnnotatorOHEM (operator_py/box_annotator_ohem.py:19-86): per-ROI loss
    is cls NLL + smooth-l1 bbox loss; non-kept ROIs get label -1 / weight 0.
    Ignored rows (label -1) never win a slot.
    """
    logp = jax.nn.log_softmax(cls_score, axis=-1)
    safe_label = jnp.clip(label, 0, cls_score.shape[-1] - 1)
    cls_loss = -jnp.take_along_axis(logp, safe_label[:, None], axis=1)[:, 0]

    diff = jnp.abs(bbox_pred - bbox_target)
    sl1 = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)
    box_loss = jnp.sum(bbox_weight * sl1, axis=1)

    per_roi = jnp.where(label >= 0, cls_loss + box_loss, _NEG)
    keep = _keep_top(label >= 0, per_roi, roi_per_img, roi_per_img)
    labels_ohem = jnp.where(keep, label, -1)
    weights_ohem = jnp.where(keep[:, None], bbox_weight, 0.0)
    return labels_ohem, weights_ohem


def nms_multi_target(sorted_bbox: jnp.ndarray, gt_boxes: jnp.ndarray,
                     gt_valid: jnp.ndarray, sorted_score: jnp.ndarray,
                     target_thresh) -> jnp.ndarray:
    """Learned-NMS training target: per (fg class, IoU threshold), mark the one
    max-score box whose best-overlap gt matches, mAP-style.

    sorted_bbox: [F, C, 4]; gt_boxes: [G, 5] padded; sorted_score: [F, C];
    target_thresh: sequence of T thresholds.
    Returns [F, C, T] float targets. Mirrors operator_py/nms_multi_target.py:24-74.
    """
    F, C, _ = sorted_bbox.shape
    G = gt_boxes.shape[0]
    thr = jnp.asarray(target_thresh, dtype=jnp.float32)          # [T]

    def per_class(cls_idx):
        valid_g = gt_valid & (gt_boxes[:, 4].astype(jnp.int32) == cls_idx + 1)
        ov = bbox_overlaps(sorted_bbox[:, cls_idx, :], gt_boxes[:, :4])  # [F, G]
        ov_valid = jnp.where(valid_g[None, :], ov, -1.0)
        best_gt = jnp.argmax(ov_valid, axis=1)                   # [F]
        best_onehot = jax.nn.one_hot(best_gt, G)                 # [F, G]
        score = sorted_score[:, cls_idx]

        def per_thresh(t):
            mask = (ov_valid > t)                                # [F, G]
            has_any = jnp.any(mask, axis=1)                      # valid_bbox rows
            oscore = score[:, None] * mask * best_onehot         # [F, G]
            winner = jnp.argmax(oscore, axis=0)                  # [G]
            marked = jnp.any(jax.nn.one_hot(winner, F, dtype=bool).T
                             & valid_g[None, :], axis=1)         # [F]
            return (marked & has_any).astype(jnp.float32)

        out = jax.vmap(per_thresh)(thr)                          # [T, F]
        any_gt = jnp.any(valid_g)
        return jnp.where(any_gt, out.T, 0.0)                     # [F, T]

    return jax.vmap(per_class)(jnp.arange(C)).transpose(1, 0, 2)  # [F, C, T]
