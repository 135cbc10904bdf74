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

    pixel_means = tuple(float(m) for m in cfg.network.PIXEL_MEANS)

    @jax.jit
    def rpn_forward(params, image, im_info):
        from relation_tpu.core.predictor import _image_from_u8
        image = _image_from_u8(image, im_info, pixel_means)
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
                float(cfg.TEST.PROPOSAL_MIN_SIZE),
                topk=str(cfg.TPU.get("FPN_TOPK", "exact")))
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


# proposal-recall area breakdown (reference imdb.py:287-289)
RECALL_AREA_RANGES = {
    "all": (0.0, 1e5 ** 2), "0-25": (0.0, 25.0 ** 2),
    "25-50": (25.0 ** 2, 50.0 ** 2), "50-100": (50.0 ** 2, 100.0 ** 2),
    "100-200": (100.0 ** 2, 200.0 ** 2), "200-300": (200.0 ** 2, 300.0 ** 2),
    "300-inf": (300.0 ** 2, 1e5 ** 2),
}


def _greedy_gt_coverage(ov: np.ndarray) -> np.ndarray:
    """One-to-one greedy proposal<->gt matching (imdb.py:339-357): repeatedly
    take the best-covered gt, record its IoU, retire both sides. Returns the
    recorded IoU per matched round, padded with zeros to n_gt."""
    ov = ov.copy()
    n_box, n_gt = ov.shape
    out = np.zeros(n_gt)
    for j in range(min(n_box, n_gt)):
        box_per_gt = ov.argmax(axis=0)
        best_per_gt = ov.max(axis=0)
        gt_ind = best_per_gt.argmax()
        out[j] = best_per_gt[gt_ind]
        ov[box_per_gt[gt_ind], :] = -1
        ov[:, gt_ind] = -1
    return out


def evaluate_recall(roidb, candidate_boxes, thresholds=None) -> dict:
    """Proposal recall metrics (reference imdb.evaluate_recall, imdb.py:274-379):
    per area range, one-to-one greedy matching of proposals to gt, recall at
    each IoU threshold + average recall; plus the proposal-size histogram.

    Returns {'areas': {name: {recalls, thresholds, ar, num_pos}},
             'proposal_area_pct': {name: fraction}, 'ar': all-range AR} —
    'recalls'/'ar' of the 'all' range mirror the reference's headline lines.
    """
    thresholds = np.asarray(thresholds if thresholds is not None
                            else np.arange(0.5, 0.95 + 1e-5, 0.05))

    def areas_of(b):
        return (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)

    # proposal size histogram (imdb.py:291-305)
    area_counts = {}
    for name, (lo, hi) in RECALL_AREA_RANGES.items():
        if name == "all":
            continue
        c = 0
        for boxes in candidate_boxes:
            if len(boxes):
                a = areas_of(boxes[:, :4])
                c += int(((a >= lo) & (a < hi)).sum())
        area_counts[name] = c
    total = float(max(sum(area_counts.values()), 1))

    out_areas = {}
    for name, (lo, hi) in RECALL_AREA_RANGES.items():
        gt_overlaps = []
        num_pos = 0
        for entry, boxes in zip(roidb, candidate_boxes):
            gt = entry["boxes"]
            # crowd exclusion (imdb.py:317: max_overlaps==1 check)
            keep = ~entry.get("iscrowd", np.zeros(len(gt), bool))
            gt = gt[keep & (entry["gt_classes"][:len(keep)] > 0)
                    if "gt_classes" in entry else keep]
            if len(gt):
                ga = areas_of(gt)
                gt = gt[(ga >= lo) & (ga < hi)]
            num_pos += len(gt)
            if len(gt) == 0 or len(boxes) == 0:
                continue
            ov = native.bbox_overlaps(boxes[:, :4].astype(np.float32),
                                      gt.astype(np.float32))
            gt_overlaps.append(_greedy_gt_coverage(ov))
        cov = np.concatenate(gt_overlaps) if gt_overlaps else np.zeros(0)
        recalls = (np.asarray([(cov >= t).sum() / float(num_pos)
                               for t in thresholds])
                   if num_pos else np.zeros_like(thresholds))
        out_areas[name] = {"recalls": recalls, "thresholds": thresholds,
                           "ar": float(recalls.mean()), "num_pos": num_pos}

    allr = out_areas["all"]
    return {"areas": out_areas, "ar": allr["ar"], "recalls": allr["recalls"],
            "thresholds": thresholds, "num_gt": allr["num_pos"],
            "proposal_area_pct": {k: v / total for k, v in area_counts.items()}}


def _np_bbox_transform(ex: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """Reference nonlinear_transform (lib/bbox/bbox_transform.py:55-75),
    +1 width convention."""
    ew = ex[:, 2] - ex[:, 0] + 1.0
    eh = ex[:, 3] - ex[:, 1] + 1.0
    ecx = ex[:, 0] + 0.5 * (ew - 1.0)
    ecy = ex[:, 1] + 0.5 * (eh - 1.0)
    gw = gt[:, 2] - gt[:, 0] + 1.0
    gh = gt[:, 3] - gt[:, 1] + 1.0
    gcx = gt[:, 0] + 0.5 * (gw - 1.0)
    gcy = gt[:, 1] + 0.5 * (gh - 1.0)
    return np.stack([(gcx - ecx) / (ew + 1e-14), (gcy - ecy) / (eh + 1e-14),
                     np.log(gw / ew), np.log(gh / eh)], axis=1)


def add_bbox_regression_stats(roidb, num_classes: int, class_agnostic: bool,
                              regression_thresh: float = 0.5):
    """Dataset-computed bbox-target means/stds (reference
    lib/bbox/bbox_regression.py:24-117 add_bbox_regression_targets when
    BBOX_NORMALIZATION_PRECOMPUTED is false).

    Per image the candidate set is gt boxes + cached proposals (the merged
    rpn_roidb box set, imdb.py:103-188); targets are computed for candidates
    with max gt overlap >= ``regression_thresh`` against their argmax gt, and
    per-class mean/std accumulated (class 1 collects everything when
    class-agnostic, bbox_regression.py:91).

    Returns (means [K, 4], stds [K, 4]) with K = 2 if class_agnostic else
    num_classes; row 0 (background) stays zero-mean/unit-free like the
    reference. The training path consumes row 1..: for the agnostic configs
    feed ``means[1], stds[1]`` to sample_rois.
    """
    K = 2 if class_agnostic else num_classes
    counts = np.zeros((K, 1)) + 1e-14
    sums = np.zeros((K, 4))
    sq = np.zeros((K, 4))
    for entry in roidb:
        gt = np.asarray(entry["boxes"], np.float32)
        keep = ~entry.get("iscrowd", np.zeros(len(gt), bool))
        gt = gt[keep]
        classes = np.asarray(entry["gt_classes"])[keep] \
            if "gt_classes" in entry else np.ones(len(gt), np.int64)
        if len(gt) == 0:
            continue
        props = np.asarray(entry.get("proposals", np.zeros((0, 4))), np.float32)
        rois = np.concatenate([gt, props], axis=0)
        ov = native.bbox_overlaps(rois, gt)
        max_ov = ov.max(axis=1)
        assign = ov.argmax(axis=1)
        ex = max_ov >= regression_thresh
        if not ex.any():
            continue
        tgts = _np_bbox_transform(rois[ex], gt[assign[ex]])
        labels = classes[assign[ex]]
        for cls in range(1, K):
            sel = slice(None) if class_agnostic else (labels == cls)
            t = tgts[sel] if not class_agnostic else tgts
            if len(t) == 0:
                continue
            counts[cls] += len(t)
            sums[cls] += t.sum(axis=0)
            sq[cls] += (t ** 2).sum(axis=0)
    means = sums / counts
    stds = np.sqrt(np.maximum(sq / counts - means ** 2, 0.0))
    return means, stds


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


def make_train_step_rcnn(model, cfg, max_rois: int, max_gt: int,
                         bbox_means=None, bbox_stds=None,
                         train_shared: bool = False,
                         fixed_prefixes=None, no_grad: bool = False,
                         stop_after: str = ""):
    """Head-only train step on precomputed proposals (reference
    function/train_rcnn.py:32-183 semantics: sample_rois over cached rois, frozen
    shared trunk per FIXED_PARAMS_SHARED, no RPN loss). When TRAIN.LEARN_NMS the
    relation/learn-NMS branch trains too (the reference trains its best FPN
    numbers this way — train_rcnn.py builds the full *_learn_nms symbol).

    ``train_shared`` switches the freeze set to network.FIXED_PARAMS_SHARED
    (reference function/train_rcnn.py:119-123: the RCNN stage on a trunk shared
    with an already-trained RPN freezes everything the RPN touched). The
    matching optimizer mask comes from create_train_state(fixed_prefixes=...).

    ``bbox_means``/``bbox_stds`` override cfg.TRAIN.BBOX_MEANS/STDS — feed
    roidb-computed stats from :func:`add_bbox_regression_stats` when
    BBOX_NORMALIZATION_PRECOMPUTED is false (bbox_regression.py:82-100).

    Batch schema: image [B,H,W,3], im_info [B,3], rois [B,R,4], rois_valid [B,R],
    gt_boxes [B,G,5], gt_valid [B,G].

    ``stop_after`` is a benchmarking cut (tools/microbench_train_cuts.py,
    same methodology as core/trainer.make_train_step): stop the per-image
    graph after 'trunk' (conv pyramid + 1e-30 tap), 'sample' (sample_rois),
    'pool' (ROI feature extraction), or 'head' (cls/bbox losses, no
    learned-NMS branch). '' = the full step.
    """
    import jax
    import jax.numpy as jnp
    from relation_tpu.models.targets import (sample_rois, ohem_select,
                                             nms_multi_target)
    from relation_tpu.models.losses import (rcnn_losses, accuracy_ignore,
                                            learn_nms_losses, nms_accuracy)
    from relation_tpu.models.fpn import RelationRCNNFPN

    is_fpn = isinstance(model, RelationRCNNFPN)
    batch_rois = int(cfg.TRAIN.BATCH_ROIS)
    num_reg = 2 if cfg.CLASS_AGNOSTIC else cfg.dataset.NUM_CLASSES
    ohem = bool(cfg.TRAIN.ENABLE_OHEM)
    learn_nms = bool(cfg.TRAIN.LEARN_NMS)
    if learn_nms and batch_rois >= 0:
        raise ValueError("LEARN_NMS requires take-all ROI mode (BATCH_ROIS=-1), "
                         "as in the reference configs")
    threshes = tuple(np.fromstring(cfg.network.NMS_TARGET_THRESH, dtype=float,
                                   sep=","))
    bbox_norm = float(cfg.TRAIN.BATCH_ROIS_OHEM if ohem
                      else (300 if batch_rois < 0 else batch_rois))
    nongt_dim = min(int(cfg.TRAIN.RPN_POST_NMS_TOP_N), max_rois)
    bbox_means = tuple(bbox_means if bbox_means is not None
                       else cfg.TRAIN.BBOX_MEANS)
    bbox_stds = tuple(bbox_stds if bbox_stds is not None
                      else cfg.TRAIN.BBOX_STDS)
    if fixed_prefixes is None:
        fixed_prefixes = tuple(cfg.network.FIXED_PARAMS_SHARED if train_shared
                               else cfg.network.FIXED_PARAMS)
    else:
        fixed_prefixes = tuple(fixed_prefixes)

    pixel_means = tuple(float(m) for m in cfg.network.PIXEL_MEANS)

    def per_image(params, feat, im_info, rois, rois_valid, gt_boxes, gt_valid,
                  rng):
        """Everything after the (natively batched) conv trunk, for ONE image —
        ``feat`` is this image's slice of the batched trunk output (same
        structure as core/trainer.make_train_step: the trunk must NOT run
        under vmap, whose pallas-stem batching rule VMEM-OOMs at B>1)."""
        if stop_after == "trunk":
            tot = 1e-30 * sum(jnp.sum(f.astype(jnp.float32))
                              for f in jax.tree.leaves(feat))
            return tot, {"total_loss": tot}
        tgt = sample_rois(
            rois, rois_valid, gt_boxes, gt_valid, rng,
            batch_rois=batch_rois, num_reg_classes=num_reg,
            fg_fraction=float(cfg.TRAIN.FG_FRACTION),
            fg_thresh=float(cfg.TRAIN.FG_THRESH),
            bg_thresh_hi=float(cfg.TRAIN.BG_THRESH_HI),
            bg_thresh_lo=float(cfg.TRAIN.BG_THRESH_LO),
            bbox_normalize=True,
            bbox_means=bbox_means,
            bbox_stds=bbox_stds,
            bbox_weights=tuple(np.asarray(cfg.TRAIN.BBOX_WEIGHTS).tolist()))
        if stop_after == "sample":
            tot = 1e-30 * (jnp.sum(tgt["rois"]) + jnp.sum(tgt["bbox_target"]) +
                           jnp.sum(tgt["label"].astype(jnp.float32)))
            return tot, {"total_loss": tot}
        if stop_after == "pool":
            flat = model.apply({"params": params}, feat, tgt["rois"],
                               nongt_dim, pool_only=True,
                               method=type(model).head)
            tot = 1e-30 * jnp.sum(flat)
            return tot, {"total_loss": tot}
        cls_score, bbox_pred, fc2 = model.apply(
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
        metrics = {"rcnn_cls_loss": cls_loss, "rcnn_bbox_loss": bbox_loss,
                   "rcnn_acc": accuracy_ignore(cls_score, label)}

        if learn_nms and stop_after != "head":
            # same branch as the e2e step (core/trainer.py) — the reference's
            # train_rcnn graph ends in nms_multi_target + the rank losses
            # (resnet_v1_101_fpn_rcnn_learn_nms_*.py get_symbol tail)
            ln = model.apply(
                {"params": params}, cls_score[:nongt_dim], bbox_pred[:nongt_dim],
                tgt["rois"][:nongt_dim], fc2[:nongt_dim], im_info,
                method=type(model).learn_nms)
            nt = nms_multi_target(ln["sorted_bbox"], gt_boxes, gt_valid,
                                  jax.lax.stop_gradient(ln["sorted_score"]),
                                  threshes)
            nms_total, pos_l, neg_l = learn_nms_losses(
                ln["nms_multi_score"], nt, float(cfg.TRAIN.nms_loss_scale),
                float(cfg.TRAIN.nms_pos_scale))
            acc_pos, acc_neg = nms_accuracy(ln["nms_multi_score"], nt)
            total = total + nms_total
            metrics.update({"nms_pos_loss": pos_l, "nms_neg_loss": neg_l,
                            "nms_acc_pos": acc_pos, "nms_acc_neg": acc_neg})

        metrics["total_loss"] = total
        return total, metrics

    def train_step(state, batch):
        step_rng = jax.random.fold_in(state.rng, state.step)
        B = batch["image"].shape[0]
        rngs = jax.random.split(step_rng, B)

        def loss_fn(params):
            # grad_req='null' analogue (reference core/module.py:753-773):
            # frozen params are stop_gradient'd so XLA DCEs their backward
            # kernels; numerics are unchanged (the optimizer mask already
            # zeroes those grads) — same policy as core/trainer.make_train_step
            from relation_tpu.core.trainer import trainable_mask
            from relation_tpu.core.predictor import _image_from_u8
            mask = trainable_mask(params, fixed_prefixes)
            params = jax.tree.map(
                lambda p, t: p if t else jax.lax.stop_gradient(p),
                params, mask)
            images = jax.vmap(
                lambda im, ii: _image_from_u8(im, ii, pixel_means))(
                    batch["image"], batch["im_info"])
            # conv trunk natively batched, like core/trainer.make_train_step
            # (one conv program over B; keeps the Pallas stem's B==1 dispatch
            # honest — vmap's pallas batching rule VMEM-OOMs at B>1)
            if is_fpn:
                feat, _ = model.apply({"params": params}, images,
                                      method=RelationRCNNFPN.features_and_rpn)
            else:
                feat, _, _ = model.apply({"params": params}, images,
                                         method=type(model).features_and_rpn)
            totals, metrics = jax.vmap(
                per_image, in_axes=(None, 0, 0, 0, 0, 0, 0, 0))(
                params, feat, batch["im_info"], batch["rois"],
                batch["rois_valid"], batch["gt_boxes"], batch["gt_valid"], rngs)
            return jnp.mean(totals), jax.tree.map(jnp.mean, metrics)

        if no_grad:
            _, metrics = loss_fn(state.params)
            return state.replace(step=state.step + 1), metrics
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

    pixel_means = tuple(float(m) for m in cfg.network.PIXEL_MEANS)

    def per_image(params, rpn_raw, im_info, gt_boxes, gt_valid, rng):
        """RPN loss for ONE image from its slice of the batched trunk+RPN
        output (trunk kept out of vmap — same pallas-stem policy as
        make_train_step_rcnn / core/trainer.make_train_step)."""
        if is_fpn:
            rpn_out = rpn_raw
            anchors_d = fpn_anchors(
                {s: rpn_out[s][0].shape[:2] for s in FPN_STRIDES},
                tuple(cfg.network.ANCHOR_SCALES),
                tuple(cfg.network.ANCHOR_RATIOS))
            anchors = jnp.concatenate([anchors_d[s] for s in FPN_STRIDES])
            # raw conv layout: same (h, w, a)-major rows as the old unpack
            rpn_cls = jnp.concatenate(
                [rpn_out[s][0].astype(jnp.float32).reshape(-1, 2)
                 for s in FPN_STRIDES])
            rpn_bbox = jnp.concatenate(
                [rpn_out[s][1].astype(jnp.float32).reshape(-1, 4)
                 for s in FPN_STRIDES])
        else:
            rpn_cls, rpn_bbox = rpn_raw
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
            from relation_tpu.core.predictor import _image_from_u8
            images = jax.vmap(
                lambda im, ii: _image_from_u8(im, ii, pixel_means))(
                    batch["image"], batch["im_info"])
            if is_fpn:
                _, rpn_raw = model.apply(
                    {"params": params}, images,
                    method=RelationRCNNFPN.features_and_rpn)
            else:
                _, rpn_cls, rpn_bbox = model.apply(
                    {"params": params}, images,
                    method=type(model).features_and_rpn)
                rpn_raw = (rpn_cls, rpn_bbox)
            totals, metrics = jax.vmap(per_image, in_axes=(None, 0, 0, 0, 0, 0))(
                params, rpn_raw, batch["im_info"], batch["gt_boxes"],
                batch["gt_valid"], rngs)
            return jnp.mean(totals), jax.tree.map(jnp.mean, metrics)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return state.apply_gradients(grads), metrics

    return train_step
