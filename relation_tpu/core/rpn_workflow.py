"""Alternate / cached-proposal training workflow.

Reference surface being mirrored:
- generate RPN proposals to disk    <- core/tester.py:63-126 generate_proposals +
                                       function/test_rpn.py (dumps <imdb>_rpn.pkl)
- proposal recall evaluation        <- lib/dataset/imdb.py:274-379 evaluate_recall
- proposal roidb merge              <- lib/dataset/imdb.py:103-188 rpn_roidb +
                                       lib/utils/load_data.py:24 load_proposal_roidb
- RCNN-only training on cached rois <- function/train_rcnn.py + core/loader.ROIIter

The FPN configs in the reference train this way (proposal_cache yaml key); the
e2e TPU path also covers FPN, but this workflow is kept for parity and for
RPN/RCNN alternate experimentation.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from relation_tpu.utils import native


def generate_rpn_proposals(model, params, cfg, roidb, out_path: str,
                           loader=None) -> str:
    """Run RPN-only inference over roidb and dump per-image [N, 5]
    (x1, y1, x2, y2, score) proposals (original image coords) to a pickle."""
    import jax
    import jax.numpy as jnp
    from relation_tpu.data.loader import TestLoader
    from relation_tpu.models.rpn import generate_proposals
    from relation_tpu.models.fpn import (RelationRCNNFPN, fpn_anchors,
                                         generate_proposals_fpn, FPN_STRIDES)
    from relation_tpu.ops.anchors import generate_anchors, shift_anchors

    loader = loader or TestLoader(roidb, cfg)
    is_fpn = isinstance(model, RelationRCNNFPN)
    stride = int(cfg.network.RPN_FEAT_STRIDE)
    base_anchors = generate_anchors(stride, tuple(cfg.network.ANCHOR_RATIOS),
                                    tuple(cfg.network.ANCHOR_SCALES))

    @jax.jit
    def rpn_forward(params, image, im_info):
        if is_fpn:
            _, rpn_out = model.apply({"params": params}, image,
                                     method=RelationRCNNFPN.features_and_rpn)
            anchors = fpn_anchors(
                {s: rpn_out[s][0].shape[:2] for s in FPN_STRIDES},
                tuple(cfg.network.ANCHOR_SCALES),
                tuple(cfg.network.ANCHOR_RATIOS))
            return generate_proposals_fpn(
                rpn_out, anchors, im_info,
                int(cfg.TEST.PROPOSAL_PRE_NMS_TOP_N),
                int(cfg.TEST.PROPOSAL_POST_NMS_TOP_N),
                float(cfg.TEST.PROPOSAL_NMS_THRESH),
                float(cfg.TEST.PROPOSAL_MIN_SIZE))
        feat, rpn_cls, rpn_bbox = model.apply(
            {"params": params}, image, method=type(model).features_and_rpn)
        import jax.nn
        fg = jax.nn.softmax(rpn_cls, axis=-1)[..., 1]
        return generate_proposals(
            fg, rpn_bbox, base_anchors, im_info, stride,
            int(cfg.TEST.PROPOSAL_PRE_NMS_TOP_N),
            int(cfg.TEST.PROPOSAL_POST_NMS_TOP_N),
            float(cfg.TEST.PROPOSAL_NMS_THRESH),
            float(cfg.TEST.PROPOSAL_MIN_SIZE))

    boxes_per_image = []
    import jax.numpy as jnp
    for image_id, img, im_info in loader:
        rois, scores, real = rpn_forward(params, jnp.asarray(img),
                                         jnp.asarray(im_info))
        rois = np.asarray(rois) / float(im_info[2])       # back to original coords
        scores = np.asarray(scores)
        real = np.asarray(real)
        boxes_per_image.append(
            np.concatenate([rois[real], scores[real, None]], axis=1))

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "wb") as f:
        pickle.dump(boxes_per_image, f)
    return out_path


def evaluate_recall(roidb, candidate_boxes, thresholds=None) -> dict:
    """Proposal recall at IoU thresholds (reference imdb.evaluate_recall,
    imdb.py:274-379, simplified to the 'all' area range)."""
    thresholds = thresholds or np.arange(0.5, 1.0, 0.05)
    gt_overlaps = []
    for entry, boxes in zip(roidb, candidate_boxes):
        gt = entry["boxes"]
        keep = ~entry.get("iscrowd", np.zeros(len(gt), bool))
        gt = gt[keep]
        if len(gt) == 0 or len(boxes) == 0:
            continue
        ov = native.bbox_overlaps(boxes[:, :4].astype(np.float32),
                                  gt.astype(np.float32))
        gt_overlaps.append(ov.max(axis=0))
    if not gt_overlaps:
        return {"recalls": np.zeros(len(thresholds)), "thresholds": thresholds,
                "ar": 0.0}
    gt_overlaps = np.concatenate(gt_overlaps)
    recalls = np.asarray([(gt_overlaps >= t).mean() for t in thresholds])
    return {"recalls": recalls, "thresholds": np.asarray(thresholds),
            "ar": float(recalls.mean()), "num_gt": len(gt_overlaps)}


def load_proposal_roidb(roidb, proposal_file: str, top_rois: int = -1) -> list:
    """Attach cached proposals to a gt roidb (reference load_proposal_roidb,
    load_data.py:24 + imdb.rpn_roidb): each entry gains 'proposals' [N, 4]."""
    with open(proposal_file, "rb") as f:
        boxes_per_image = pickle.load(f)
    assert len(boxes_per_image) == len(roidb), \
        f"{len(boxes_per_image)} proposal sets != {len(roidb)} images"
    out = []
    for entry, props in zip(roidb, boxes_per_image):
        e = dict(entry)
        if top_rois > 0:
            order = np.argsort(-props[:, 4])[:top_rois]
            props = props[order]
        e["proposals"] = props[:, :4].astype(np.float32)
        out.append(e)
    return out


def make_train_step_rcnn(model, cfg, max_rois: int, max_gt: int):
    """Head-only train step on precomputed proposals (reference
    function/train_rcnn.py:32-183 semantics: sample_rois over cached rois, frozen
    shared trunk per FIXED_PARAMS_SHARED, no RPN loss).

    Batch schema: image [B,H,W,3], im_info [B,3], rois [B,R,4], rois_valid [B,R],
    gt_boxes [B,G,5], gt_valid [B,G].
    """
    import jax
    import jax.numpy as jnp
    from relation_tpu.models.targets import sample_rois, ohem_select
    from relation_tpu.models.losses import rcnn_losses, accuracy_ignore
    from relation_tpu.models.fpn import RelationRCNNFPN

    is_fpn = isinstance(model, RelationRCNNFPN)
    batch_rois = int(cfg.TRAIN.BATCH_ROIS)
    num_reg = 2 if cfg.CLASS_AGNOSTIC else cfg.dataset.NUM_CLASSES
    ohem = bool(cfg.TRAIN.ENABLE_OHEM)
    bbox_norm = float(cfg.TRAIN.BATCH_ROIS_OHEM if ohem
                      else (300 if batch_rois < 0 else batch_rois))
    nongt_dim = min(int(cfg.TRAIN.RPN_POST_NMS_TOP_N), max_rois)

    def per_image(params, image, im_info, rois, rois_valid, gt_boxes, gt_valid,
                  rng):
        if is_fpn:
            feat, _ = model.apply({"params": params}, image,
                                  method=RelationRCNNFPN.features_and_rpn)
        else:
            feat, _, _ = model.apply({"params": params}, image,
                                     method=type(model).features_and_rpn)
        tgt = sample_rois(
            rois, rois_valid, gt_boxes, gt_valid, rng,
            batch_rois=batch_rois, num_reg_classes=num_reg,
            fg_fraction=float(cfg.TRAIN.FG_FRACTION),
            fg_thresh=float(cfg.TRAIN.FG_THRESH),
            bg_thresh_hi=float(cfg.TRAIN.BG_THRESH_HI),
            bg_thresh_lo=float(cfg.TRAIN.BG_THRESH_LO),
            bbox_normalize=bool(cfg.TRAIN.BBOX_NORMALIZATION_PRECOMPUTED),
            bbox_means=tuple(cfg.TRAIN.BBOX_MEANS),
            bbox_stds=tuple(cfg.TRAIN.BBOX_STDS),
            bbox_weights=tuple(np.asarray(cfg.TRAIN.BBOX_WEIGHTS).tolist()))
        cls_score, bbox_pred, _ = model.apply(
            {"params": params}, feat, tgt["rois"], nongt_dim,
            method=type(model).head)
        label, weight = tgt["label"], tgt["bbox_weight"]
        if ohem:
            label, weight = ohem_select(cls_score, bbox_pred, label,
                                        tgt["bbox_target"], weight,
                                        int(cfg.TRAIN.BATCH_ROIS_OHEM))
        cls_loss, bbox_loss = rcnn_losses(cls_score, bbox_pred, label,
                                          tgt["bbox_target"], weight, bbox_norm)
        total = cls_loss + bbox_loss
        return total, {"rcnn_cls_loss": cls_loss, "rcnn_bbox_loss": bbox_loss,
                       "rcnn_acc": accuracy_ignore(cls_score, label),
                       "total_loss": total}

    def train_step(state, batch):
        step_rng = jax.random.fold_in(state.rng, state.step)
        B = batch["image"].shape[0]
        rngs = jax.random.split(step_rng, B)

        def loss_fn(params):
            totals, metrics = jax.vmap(
                per_image, in_axes=(None, 0, 0, 0, 0, 0, 0, 0))(
                params, batch["image"], batch["im_info"], batch["rois"],
                batch["rois_valid"], batch["gt_boxes"], batch["gt_valid"], rngs)
            return jnp.mean(totals), jax.tree.map(jnp.mean, metrics)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return state.apply_gradients(grads), metrics

    return train_step


def make_train_step_rpn(model, cfg, max_gt: int):
    """RPN-only train step (reference function/train_rpn.py:29-135 - the alternate
    training scheme: train the RPN standalone, then dump proposals for a separate
    RCNN stage). Loss = RPN cls (valid-normalized CE) + smooth-l1 bbox.

    Batch schema: image [B,H,W,3], im_info [B,3], gt_boxes [B,G,5], gt_valid [B,G].
    """
    import jax
    import jax.numpy as jnp
    from relation_tpu.models.targets import anchor_targets
    from relation_tpu.models.losses import rpn_losses, accuracy_ignore
    from relation_tpu.models.fpn import RelationRCNNFPN, fpn_anchors, FPN_STRIDES
    from relation_tpu.ops.anchors import generate_anchors, shift_anchors

    is_fpn = isinstance(model, RelationRCNNFPN)
    stride = int(cfg.network.RPN_FEAT_STRIDE)
    base_anchors = generate_anchors(stride, tuple(cfg.network.ANCHOR_RATIOS),
                                    tuple(cfg.network.ANCHOR_SCALES))

    def per_image(params, image, im_info, gt_boxes, gt_valid, rng):
        if is_fpn:
            _, rpn_out = model.apply({"params": params}, image,
                                     method=RelationRCNNFPN.features_and_rpn)
            anchors_d = fpn_anchors(
                {s: rpn_out[s][0].shape[:2] for s in FPN_STRIDES},
                tuple(cfg.network.ANCHOR_SCALES),
                tuple(cfg.network.ANCHOR_RATIOS))
            anchors = jnp.concatenate([anchors_d[s] for s in FPN_STRIDES])
            rpn_cls = jnp.concatenate(
                [rpn_out[s][0].reshape(-1, 2) for s in FPN_STRIDES])
            rpn_bbox = jnp.concatenate(
                [rpn_out[s][1].reshape(-1, 4) for s in FPN_STRIDES])
        else:
            _, rpn_cls, rpn_bbox = model.apply(
                {"params": params}, image, method=type(model).features_and_rpn)
            fh, fw = rpn_cls.shape[0], rpn_cls.shape[1]
            anchors = shift_anchors(base_anchors, fh, fw, stride)
            rpn_cls = rpn_cls.reshape(-1, 2)
            rpn_bbox = rpn_bbox.reshape(-1, 4)

        label, btgt, bwt = anchor_targets(
            anchors, gt_boxes, gt_valid, im_info, rng,
            rpn_batch_size=int(cfg.TRAIN.RPN_BATCH_SIZE),
            fg_fraction=float(cfg.TRAIN.RPN_FG_FRACTION),
            positive_overlap=float(cfg.TRAIN.RPN_POSITIVE_OVERLAP),
            negative_overlap=float(cfg.TRAIN.RPN_NEGATIVE_OVERLAP),
            clobber_positives=bool(cfg.TRAIN.RPN_CLOBBER_POSITIVES),
            bbox_weights=tuple(cfg.TRAIN.RPN_BBOX_WEIGHTS))
        cls_loss, bbox_loss = rpn_losses(
            rpn_cls, rpn_bbox, label, btgt, bwt,
            int(cfg.TRAIN.RPN_BATCH_SIZE), sigma=float(cfg.TRAIN.rpn_loss_scale))
        total = cls_loss + bbox_loss
        return total, {"rpn_cls_loss": cls_loss, "rpn_bbox_loss": bbox_loss,
                       "rpn_acc": accuracy_ignore(rpn_cls, label),
                       "total_loss": total}

    def train_step(state, batch):
        step_rng = jax.random.fold_in(state.rng, state.step)
        rngs = jax.random.split(step_rng, batch["image"].shape[0])

        def loss_fn(params):
            totals, metrics = jax.vmap(per_image, in_axes=(None, 0, 0, 0, 0, 0))(
                params, batch["image"], batch["im_info"], batch["gt_boxes"],
                batch["gt_valid"], rngs)
            return jnp.mean(totals), jax.tree.map(jnp.mean, metrics)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return state.apply_gradients(grads), metrics

    return train_step
