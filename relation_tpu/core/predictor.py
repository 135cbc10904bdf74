"""Inference pipeline + on-device post-processing.

Replaces the reference Predictor/im_detect/pred_eval host pipeline
(core/tester.py:27-342). The whole per-image path — backbone, RPN, on-device
proposals, head, learned NMS or classwise (soft-)NMS — is ONE jit region; the only
host work left is accumulating final padded detections for COCO eval.

Post-processing parity (core/tester.py:264-295):
- learned-NMS path: threshold filter + global max_per_image cut, no extra NMS
- classic path: per-class greedy NMS (or soft-NMS) then max_per_image
- boxes are divided by im_scale back to original image coordinates (tester.py:158)

Detections come back as a fixed-size [max_det, 6] array (cls_id, score, x1,y1,x2,y2)
with -1 class padding — static shapes end to end.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from relation_tpu.models.detector import RelationRCNN
from relation_tpu.models.rpn import generate_proposals
from relation_tpu.models.learn_nms import merge_multi_score
from relation_tpu.ops.anchors import generate_anchors, shift_anchors
from relation_tpu.ops.boxes import bbox_pred, clip_boxes
from relation_tpu.ops.nms import classwise_nms, soft_nms

_NEG_INF = -1e10


def _image_from_u8(image, im_info, pixel_means):
    """Device-side completion of the host image pipeline for uint8 inputs
    (TPU.H2D_UINT8): exact mean subtraction + re-zeroing of the bucket pad.

    The host ships post-resize uint8 pixels (data/image.py::prepare_image with
    ``pixel_means=None``) because the per-image H2D transfer serializes the
    device stream through this environment's tunnel — uint8 is 4x fewer bytes
    (measured 7.4 -> 15.3 img/s in-stream). uint8->f32 is exact and the pad
    region is forced back to 0.0 (the host-f32 path mean-subs BEFORE padding,
    so pads are zero there), making detections bit-identical.

    Handles both loader layouts: s2d planar [12, H/2, W/2] (channel k =
    row_phase*6 + col_phase*3 + bgr_c, data/image.py::to_s2d_planar) and NHWC
    [H, W, 3]. No-op for non-uint8 inputs (dtype is static under jit).
    """
    if image.dtype != jnp.uint8:
        return image
    means = jnp.asarray(pixel_means, jnp.float32).reshape(-1)
    h, w = im_info[0], im_info[1]
    if image.ndim == 3 and image.shape[0] == 12 and image.shape[-1] != 3:
        k = jnp.arange(12)
        x = image.astype(jnp.float32) - means[k % 3][:, None, None]
        hh, ww = image.shape[1], image.shape[2]
        row_ok = (2.0 * jnp.arange(hh)[None, :] + (k // 6)[:, None]) < h
        col_ok = (2.0 * jnp.arange(ww)[None, :] + ((k // 3) % 2)[:, None]) < w
        return x * (row_ok[:, :, None] & col_ok[:, None, :])
    x = image.astype(jnp.float32) - means[None, None, :]
    row_ok = jnp.arange(image.shape[0], dtype=jnp.float32)[:, None, None] < h
    col_ok = jnp.arange(image.shape[1], dtype=jnp.float32)[None, :, None] < w
    return x * (row_ok & col_ok)


def _topk_detections(cls_ids, scores, boxes, valid, max_det):
    """Global max_per_image cut over all classes (tester.py:270-277), padded."""
    masked = jnp.where(valid, scores, _NEG_INF)
    top_scores, idx = jax.lax.top_k(masked, max_det)
    real = top_scores > _NEG_INF / 2
    out = jnp.concatenate([
        jnp.where(real, cls_ids[idx], -1)[:, None].astype(jnp.float32),
        jnp.where(real, top_scores, 0.0)[:, None],
        boxes[idx] * real[:, None],
    ], axis=1)
    return out


def prepare_res4_folded(model, params, enabled: bool = False):
    """Precompute the BN-folded res4 weight stacks that enable the fused
    VMEM-resident res4 Pallas kernel (ops/pallas/res4.py). Run ONCE per
    checkpoint and pass the result as ``res4_folded`` to the predict fn.

    DEFAULT OFF (``enabled=False``; opt in via cfg.TPU.FUSE_RES4): measured on
    v5e, the kernel itself beats XLA's in-context res4b stack only slightly
    (644 us vs ~726 us), but the presence of the custom call breaks XLA's
    space-to-batch conv rewrites for every upstream res2/res3 conv — ~423 MB
    of materialized wrapper copies, ~+1.0 ms end-to-end (full analysis in
    tools/microbench_res4.py docstring). Net e2e effect: 3.22 -> 5.13 ms.
    Kept as infrastructure: the balance may flip at other image buckets, on
    other TPU generations, or with a future XLA that re-fuses the wrappers.

    Returns None when disabled, when the model has no ResNet-101 C4 trunk, or
    on CPU (where the kernel would run in interpret mode)."""
    import jax as _jax
    from relation_tpu.models.fpn import RelationRCNNFPN
    if (not enabled
            or isinstance(model, RelationRCNNFPN)   # FPN predict has no fused path
            or getattr(model, "backbone", "resnet101") != "resnet101"
            or "c4" not in params
            or _jax.default_backend() == "cpu"):
        return None
    from relation_tpu.models.backbone import fold_res4_params
    return _jax.jit(fold_res4_params)(params["c4"])


def make_predict_fn(model: RelationRCNN, cfg, feat_hw: tuple[int, int]):
    """Build the jitted single-image inference function for one bucket.

    Returns fn(params, image [H,W,3], im_info [3], res4_folded=None) -> dict with
      detections [max_per_image, 6]  (cls, score, x1, y1, x2, y2; original coords)
      and the raw head outputs for diagnostics.
    ``res4_folded`` (from ``prepare_res4_folded``) switches the backbone to the
    fused res4 stack kernel.
    """
    stride = int(cfg.network.RPN_FEAT_STRIDE)
    base_anchors = generate_anchors(stride, tuple(cfg.network.ANCHOR_RATIOS),
                                    tuple(cfg.network.ANCHOR_SCALES))
    fh, fw = feat_hw
    nongt_dim = int(cfg.TEST.RPN_POST_NMS_TOP_N)
    num_classes = int(cfg.dataset.NUM_CLASSES)
    max_det = int(cfg.TEST.max_per_image)
    learn_nms = bool(cfg.TEST.LEARN_NMS)
    softnms = bool(cfg.TEST.SOFTNMS)
    nms_thresh = float(cfg.TEST.NMS)
    merge_method = int(cfg.TEST.MERGE_METHOD)
    score_thresh = float(cfg.TEST.get("SCORE_THRESH", 1e-3))
    class_agnostic = bool(cfg.CLASS_AGNOSTIC)
    stds = tuple(cfg.TRAIN.BBOX_STDS) if cfg.TRAIN.BBOX_NORMALIZATION_PRECOMPUTED else None
    means = tuple(cfg.TRAIN.BBOX_MEANS) if cfg.TRAIN.BBOX_NORMALIZATION_PRECOMPUTED else None

    from relation_tpu.models.fpn import (RelationRCNNFPN, fpn_anchors,
                                         generate_proposals_fpn, FPN_STRIDES)
    is_fpn = isinstance(model, RelationRCNNFPN)

    pixel_means = tuple(float(m) for m in cfg.network.PIXEL_MEANS)
    # test.py --debug: monitor taps (reference operator_py/monitor_op.py) on
    # the predict path's key tensors. Stats ride the program OUTPUTS
    # (out["monitor"]) rather than jax.debug.print — the axon PJRT tunnel
    # rejects host send/recv callbacks; the evaluator logs the fetched triples
    debug_mon = bool(cfg.TPU.get("DEBUG_MONITOR", False))

    def predict(params, image, im_info, res4_folded=None):
        taps = {}

        def _mon(x, name):
            if debug_mon:
                from relation_tpu.utils.debug import tensor_stats
                taps[name] = tensor_stats(x)
            return x

        image = _image_from_u8(image, im_info, pixel_means)
        if is_fpn:
            feat, rpn_out = model.apply(
                {"params": params}, image,
                method=RelationRCNNFPN.features_and_rpn)
            level_anchors = fpn_anchors(
                {s: rpn_out[s][0].shape[:2] for s in FPN_STRIDES},
                tuple(cfg.network.ANCHOR_SCALES),
                tuple(cfg.network.ANCHOR_RATIOS))
            rois, roi_scores, roi_real = generate_proposals_fpn(
                rpn_out, level_anchors, im_info,
                int(cfg.TEST.RPN_PRE_NMS_TOP_N), int(cfg.TEST.RPN_POST_NMS_TOP_N),
                float(cfg.TEST.RPN_NMS_THRESH), float(cfg.TEST.RPN_MIN_SIZE),
                topk=str(cfg.TPU.get("FPN_TOPK", "exact")))
        else:
            feat, rpn_cls, rpn_bbox = model.apply(
                {"params": params}, image, res4_folded,
                method=RelationRCNN.features_and_rpn)
            fg_prob = jax.nn.softmax(rpn_cls, axis=-1)[..., 1]
            rois, roi_scores, roi_real = generate_proposals(
                fg_prob, rpn_bbox, base_anchors, im_info, stride,
                int(cfg.TEST.RPN_PRE_NMS_TOP_N), int(cfg.TEST.RPN_POST_NMS_TOP_N),
                float(cfg.TEST.RPN_NMS_THRESH), float(cfg.TEST.RPN_MIN_SIZE))

        rois = _mon(rois, "rois")
        cls_score, bbox_deltas, fc2 = model.apply(
            {"params": params}, feat, rois, nongt_dim, method=type(model).head)
        cls_score = _mon(cls_score, "cls_score")
        bbox_deltas = _mon(bbox_deltas, "bbox_deltas")
        out = {"rois": rois, "roi_scores": roi_scores}

        if learn_nms:
            ln = model.apply({"params": params}, cls_score, bbox_deltas, rois, fc2,
                             im_info, float(cfg.TEST.LEARN_NMS_CLASS_SCORE_TH),
                             method=type(model).learn_nms)
            final = merge_multi_score(ln["nms_multi_score"], merge_method)  # [F, C]
            boxes = ln["sorted_bbox"] / im_info[2]                          # [F, C, 4]
            F, C = final.shape
            cls_ids = jnp.broadcast_to(jnp.arange(1, C + 1)[None, :], (F, C))
            valid = final > score_thresh
            dets = _topk_detections(cls_ids.reshape(-1), final.reshape(-1),
                                    boxes.reshape(-1, 4), valid.reshape(-1), max_det)
            out.update(dets=dets, sorted_bbox=ln["sorted_bbox"],
                       sorted_score=ln["sorted_score"], final_score=final)
        else:
            cls_prob = jax.nn.softmax(cls_score, axis=-1)                   # [N, C]
            deltas = bbox_deltas
            if stds is not None:
                # undo train-time target normalization (the reference folds this
                # into *_test weights at checkpoint time, callback.py:54-61)
                k = deltas.shape[1] // 4
                deltas = (deltas.reshape(-1, k, 4) * jnp.asarray(stds)
                          + jnp.asarray(means)).reshape(-1, 4 * k)
            boxes_all = bbox_pred(rois, deltas)                             # [N, 4K]
            boxes_all = clip_boxes(boxes_all, (im_info[0], im_info[1]))
            boxes_all = boxes_all / im_info[2]

            N = cls_prob.shape[0]
            fg_classes = num_classes - 1
            scores_t = cls_prob[:, 1:].T                                    # [C, N]
            if class_agnostic:
                boxes_c = jnp.broadcast_to(
                    boxes_all.reshape(N, -1, 4)[:, 1][None], (fg_classes, N, 4))
            else:
                boxes_c = boxes_all.reshape(N, -1, 4)[:, 1:]
                boxes_c = jnp.transpose(boxes_c, (1, 0, 2))                 # [C, N, 4]
            valid = (scores_t > score_thresh) & roi_real[None, :]

            if softnms:
                sigma = nms_thresh
                idx, ks, kv = jax.vmap(
                    lambda b, s, v: soft_nms(b, s, sigma, max_det, v,
                                             score_floor=score_thresh)
                )(boxes_c, scores_t, valid)
                # [C, max_det] kept entries
                cls_ids = jnp.broadcast_to(
                    jnp.arange(1, fg_classes + 1)[:, None], idx.shape)
                kb = jnp.take_along_axis(boxes_c, idx[..., None], axis=1)
                dets = _topk_detections(cls_ids.reshape(-1), ks.reshape(-1),
                                        kb.reshape(-1, 4), kv.reshape(-1), max_det)
            else:
                # batched Pallas kernel (one launch, per-class early exit) —
                # measured 841 -> 654 us vs vmapped while_loop at C=80, n=300
                keep = classwise_nms(boxes_c, scores_t, nms_thresh,
                                     score_thresh, valid=valid,
                                     max_keep=max_det)                      # [C, N]
                cls_ids = jnp.broadcast_to(
                    jnp.arange(1, fg_classes + 1)[:, None], keep.shape)
                dets = _topk_detections(cls_ids.reshape(-1),
                                        scores_t.reshape(-1),
                                        boxes_c.reshape(-1, 4),
                                        keep.reshape(-1), max_det)
            out.update(dets=dets, cls_prob=cls_prob, pred_boxes=boxes_all)
        _mon(out["dets"], "dets")
        if taps:
            out["monitor"] = taps
        return out

    return jax.jit(predict)


def make_predict_fn_split(model, cfg, feat_hw: tuple[int, int]):
    """FPN learned-NMS inference as TWO device programs (cfg.TPU.
    FPN_SPLIT_PREDICT): stage 1 — trunk + pyramid + proposals + head —
    compiles XLA-only, so the stride-4/8 pyramid convs keep their
    space-to-batch rewrites; stage 2 — the learned-NMS tail — runs with
    ``allow_pallas=True`` (the fused Pallas geometry-bias + class-skip kernels
    that make the C4 tail ~14 us/class), quarantined in its own XLA module
    where the custom calls cannot poison stage 1 (poison scope:
    ops/pallas/bottleneck_proj.py docstring; round-1 measurement +5.6 ms when
    the kernels shared the pyramid's module).

    Both dispatches are async through the queue, so the second launch costs
    ~no wall time. Same call signature/result dict as make_predict_fn.
    """
    from relation_tpu.models.fpn import RelationRCNNFPN
    assert isinstance(model, RelationRCNNFPN) and bool(cfg.TEST.LEARN_NMS), (
        "FPN_SPLIT_PREDICT applies to the FPN learned-NMS predict path only")
    max_det = int(cfg.TEST.max_per_image)
    merge_method = int(cfg.TEST.MERGE_METHOD)
    score_thresh = float(cfg.TEST.get("SCORE_THRESH", 1e-3))

    # stage 1 reuses the single-module predict graph, stopped after the head
    stage1_model = model
    pixel_means = tuple(float(m) for m in cfg.network.PIXEL_MEANS)

    from relation_tpu.models.fpn import fpn_anchors, generate_proposals_fpn, FPN_STRIDES

    def stage1(params, image, im_info):
        image = _image_from_u8(image, im_info, pixel_means)
        feat, rpn_out = stage1_model.apply(
            {"params": params}, image, method=RelationRCNNFPN.features_and_rpn)
        level_anchors = fpn_anchors(
            {s: rpn_out[s][0].shape[:2] for s in FPN_STRIDES},
            tuple(cfg.network.ANCHOR_SCALES), tuple(cfg.network.ANCHOR_RATIOS))
        rois, roi_scores, roi_real = generate_proposals_fpn(
            rpn_out, level_anchors, im_info,
            int(cfg.TEST.RPN_PRE_NMS_TOP_N), int(cfg.TEST.RPN_POST_NMS_TOP_N),
            float(cfg.TEST.RPN_NMS_THRESH), float(cfg.TEST.RPN_MIN_SIZE),
            topk=str(cfg.TPU.get("FPN_TOPK", "exact")))
        cls_score, bbox_deltas, fc2 = stage1_model.apply(
            {"params": params}, feat, rois, int(cfg.TEST.RPN_POST_NMS_TOP_N),
            method=RelationRCNNFPN.head)
        return rois, roi_scores, cls_score, bbox_deltas, fc2

    # stage 2: the same params drive a Pallas-enabled clone (allow_pallas only
    # switches compute paths; the parameter tree is identical)
    tail_model = model.clone(allow_pallas=True)

    def stage2(params, cls_score, bbox_deltas, rois, fc2, im_info):
        ln = tail_model.apply(
            {"params": params}, cls_score, bbox_deltas, rois, fc2, im_info,
            float(cfg.TEST.LEARN_NMS_CLASS_SCORE_TH),
            method=RelationRCNNFPN.learn_nms)
        final = merge_multi_score(ln["nms_multi_score"], merge_method)
        boxes = ln["sorted_bbox"] / im_info[2]
        F, C = final.shape
        cls_ids = jnp.broadcast_to(jnp.arange(1, C + 1)[None, :], (F, C))
        valid = final > score_thresh
        dets = _topk_detections(cls_ids.reshape(-1), final.reshape(-1),
                                boxes.reshape(-1, 4), valid.reshape(-1),
                                max_det)
        return {"dets": dets, "sorted_bbox": ln["sorted_bbox"],
                "sorted_score": ln["sorted_score"], "final_score": final}

    jit1 = jax.jit(stage1)
    jit2 = jax.jit(stage2)

    def predict(params, image, im_info, res4_folded=None):
        # res4_folded: C4-only knob, accepted for signature parity
        rois, roi_scores, cls_score, bbox_deltas, fc2 = jit1(
            params, image, im_info)
        out = jit2(params, cls_score, bbox_deltas, rois, fc2,
                   jnp.asarray(im_info))
        out.update(rois=rois, roi_scores=roi_scores)
        return out

    return predict


def make_predict_fn_split3(model, cfg, feat_hw: tuple[int, int]):
    """FPN learned-NMS inference as THREE device programs
    (cfg.TPU.FPN_SPLIT_PREDICT = 3):

      stage 1 — trunk + pyramid + RPN conv heads. Pure convs, XLA-only, so the
        stride-4/8 levels keep their space-to-batch rewrites.
      stage 2 — proposal decode + pre-NMS top-k + the single-launch Pallas NMS
        sweep (``nms_topk_presorted(use_kernel=True)``, the 147 us C4 fast
        path vs ~437 us for the XLA while-loop fixpoint). The kernel is
        s2b-poison ONLY when it shares an XLA module with the pyramid convs
        (round-1 measurement: +5.6 ms; ops/nms.py docstring) — here it sees
        only the conv OUTPUTS as module inputs, exactly like the C4 flagship
        program where the same kernel is production-proven.
      stage 3 — ROI head + relation + learned-NMS tail with
        ``allow_pallas=True``: the fused Pallas geometry-bias kernel now also
        serves the head's relation_1/relation_2 (models/fpn.py:158-163), not
        just the tail's attention — no convs live here, so nothing to poison.

    All three dispatches are async through the queue (launch overhead overlaps
    device compute). Same call signature/result dict as make_predict_fn.
    Reference counterpart: one fused symbol graph (symbols/resnet_v1_101_rcnn_
    fpn_*.py) — the split is a TPU/XLA compilation-scope artifact only; the
    math is unchanged and pinned by tests/test_fpn.py against the single
    module.
    """
    from relation_tpu.models.fpn import (RelationRCNNFPN, fpn_anchors,
                                         generate_proposals_fpn, FPN_STRIDES,
                                         DISPATCH_STRIDES)
    assert isinstance(model, RelationRCNNFPN) and bool(cfg.TEST.LEARN_NMS), (
        "FPN_SPLIT_PREDICT applies to the FPN learned-NMS predict path only")
    max_det = int(cfg.TEST.max_per_image)
    merge_method = int(cfg.TEST.MERGE_METHOD)
    score_thresh = float(cfg.TEST.get("SCORE_THRESH", 1e-3))
    nongt_dim = int(cfg.TEST.RPN_POST_NMS_TOP_N)
    pixel_means = tuple(float(m) for m in cfg.network.PIXEL_MEANS)
    # Pallas NMS sweep only exists on TPU; elsewhere (CPU tests) stage 2
    # falls back to the while-loop sweep inside nms_topk_presorted itself.
    # NOTE: the CPU parity test (tests/test_fpn.py) therefore exercises the
    # fallback; device-side parity of the kernelized stage 2 rests on the
    # C4-proven nms_topk_presorted kernel (same kernel, same presorted-input
    # contract, pinned by tests/test_pallas_kernels.py on TPU).
    use_kernel = jax.default_backend() != "cpu"

    def stage1(params, image, im_info):
        image = _image_from_u8(image, im_info, pixel_means)
        pyramid, rpn_out = model.apply(
            {"params": params}, image, method=RelationRCNNFPN.features_and_rpn)
        # stage 3 pools from the dispatch strides only; drop the P6 map
        return {s: pyramid[s] for s in DISPATCH_STRIDES}, rpn_out

    def stage2(rpn_out, im_info):
        level_anchors = fpn_anchors(
            {s: rpn_out[s][0].shape[:2] for s in FPN_STRIDES},
            tuple(cfg.network.ANCHOR_SCALES), tuple(cfg.network.ANCHOR_RATIOS))
        return generate_proposals_fpn(
            rpn_out, level_anchors, im_info,
            int(cfg.TEST.RPN_PRE_NMS_TOP_N), int(cfg.TEST.RPN_POST_NMS_TOP_N),
            float(cfg.TEST.RPN_NMS_THRESH), float(cfg.TEST.RPN_MIN_SIZE),
            use_kernel=use_kernel, topk=str(cfg.TPU.get("FPN_TOPK", "exact")))

    tail_model = model.clone(allow_pallas=True)

    def stage3(params, pyramid, rois, im_info):
        cls_score, bbox_deltas, fc2 = tail_model.apply(
            {"params": params}, pyramid, rois, nongt_dim,
            method=RelationRCNNFPN.head)
        ln = tail_model.apply(
            {"params": params}, cls_score, bbox_deltas, rois, fc2, im_info,
            float(cfg.TEST.LEARN_NMS_CLASS_SCORE_TH),
            method=RelationRCNNFPN.learn_nms)
        final = merge_multi_score(ln["nms_multi_score"], merge_method)
        boxes = ln["sorted_bbox"] / im_info[2]
        F, C = final.shape
        cls_ids = jnp.broadcast_to(jnp.arange(1, C + 1)[None, :], (F, C))
        valid = final > score_thresh
        dets = _topk_detections(cls_ids.reshape(-1), final.reshape(-1),
                                boxes.reshape(-1, 4), valid.reshape(-1),
                                max_det)
        return {"dets": dets, "sorted_bbox": ln["sorted_bbox"],
                "sorted_score": ln["sorted_score"], "final_score": final}

    jit1 = jax.jit(stage1)
    jit2 = jax.jit(stage2)
    jit3 = jax.jit(stage3)

    def predict(params, image, im_info, res4_folded=None):
        # res4_folded: C4-only knob, accepted for signature parity
        pyramid, rpn_out = jit1(params, image, im_info)
        rois, roi_scores, _ = jit2(rpn_out, jnp.asarray(im_info))
        out = jit3(params, pyramid, rois, jnp.asarray(im_info))
        out.update(rois=rois, roi_scores=roi_scores)
        return out

    return predict


def make_predict_fn_sharded(model, cfg, feat_hw: tuple[int, int], mesh):
    """Data-parallel inference over a jax.sharding.Mesh: n_devices images per
    call, ONE per device — the reference's multi-GPU Predictor (one executor
    per context, core/tester.py:27-40) with outputs merged by batch concat
    (_merge_multi_context, core/DataParallelExecutorGroup.py:47-60).

    shard_map keeps each device's block at batch 1, so every device runs the
    UNMODIFIED single-image predict graph (Pallas stem kernel included — no
    vmap lifting of kernels, which VMEM-OOMs; see core/trainer.py loss_fn).
    No collectives are needed: detections concat along the sharded batch axis.

    Returns fn(params, images [n, ...], im_infos [n, 3]) -> dets [n, max_det, 6].
    Params may be host or replicated arrays; images/infos are sharded by jit
    from the spec. Compile once per (bucket, mesh).
    """
    from jax.sharding import PartitionSpec as P

    predict = make_predict_fn(model, cfg, feat_hw)
    axis = str(cfg.TPU.get("MESH_DATA_AXIS", "data"))

    def per_device(params, img, info):
        # block shapes carry a leading 1 (this device's shard of the batch)
        return predict(params, img[0], info[0])["dets"][None]

    f = jax.shard_map(per_device, mesh=mesh,
                      in_specs=(P(), P(axis), P(axis)), out_specs=P(axis),
                      check_vma=False)
    return jax.jit(f)


def make_predict_fn_rcnn(model, cfg):
    """Inference from precomputed proposals (cfg.TEST.HAS_RPN false — the
    reference's proposal-file eval path, function/test_rcnn.py:40-51 get_symbol_rcnn
    + TestLoader(has_rpn=False)).

    Returns fn(params, image [H,W,3], im_info [3], rois [R,4], rois_valid [R])
    -> dict with 'dets' like make_predict_fn. TOP_ROIS selection happens in the
    loader; padding rides through on the validity mask.
    """
    from relation_tpu.models.fpn import RelationRCNNFPN
    is_fpn = isinstance(model, RelationRCNNFPN)
    num_classes = int(cfg.dataset.NUM_CLASSES)
    max_det = int(cfg.TEST.max_per_image)
    learn_nms = bool(cfg.TEST.LEARN_NMS)
    softnms = bool(cfg.TEST.SOFTNMS)
    nms_thresh = float(cfg.TEST.NMS)
    merge_method = int(cfg.TEST.MERGE_METHOD)
    score_thresh = float(cfg.TEST.get("SCORE_THRESH", 1e-3))
    class_agnostic = bool(cfg.CLASS_AGNOSTIC)
    stds = tuple(cfg.TRAIN.BBOX_STDS) if cfg.TRAIN.BBOX_NORMALIZATION_PRECOMPUTED else None
    means = tuple(cfg.TRAIN.BBOX_MEANS) if cfg.TRAIN.BBOX_NORMALIZATION_PRECOMPUTED else None

    pixel_means = tuple(float(m) for m in cfg.network.PIXEL_MEANS)

    def predict(params, image, im_info, rois, rois_valid):
        image = _image_from_u8(image, im_info, pixel_means)
        if is_fpn:
            feat, _ = model.apply({"params": params}, image,
                                  method=RelationRCNNFPN.features_and_rpn)
        else:
            feat, _, _ = model.apply({"params": params}, image,
                                     method=type(model).features_and_rpn)
        nongt_dim = rois.shape[0]
        cls_score, bbox_deltas, fc2 = model.apply(
            {"params": params}, feat, rois, nongt_dim, method=type(model).head)
        out = {"rois": rois}

        if learn_nms:
            ln = model.apply({"params": params}, cls_score, bbox_deltas, rois,
                             fc2, im_info, method=type(model).learn_nms)
            final = merge_multi_score(ln["nms_multi_score"], merge_method)
            boxes = ln["sorted_bbox"] / im_info[2]
            F, C = final.shape
            cls_ids = jnp.broadcast_to(jnp.arange(1, C + 1)[None, :], (F, C))
            valid = final > score_thresh
            dets = _topk_detections(cls_ids.reshape(-1), final.reshape(-1),
                                    boxes.reshape(-1, 4), valid.reshape(-1),
                                    max_det)
            out.update(dets=dets, final_score=final)
            return out

        cls_prob = jax.nn.softmax(cls_score, axis=-1)
        deltas = bbox_deltas
        if stds is not None:
            kk = deltas.shape[1] // 4
            deltas = (deltas.reshape(-1, kk, 4) * jnp.asarray(stds)
                      + jnp.asarray(means)).reshape(-1, 4 * kk)
        boxes_all = bbox_pred(rois, deltas)
        boxes_all = clip_boxes(boxes_all, (im_info[0], im_info[1])) / im_info[2]
        N = cls_prob.shape[0]
        fg_classes = num_classes - 1
        scores_t = cls_prob[:, 1:].T
        if class_agnostic:
            boxes_c = jnp.broadcast_to(
                boxes_all.reshape(N, -1, 4)[:, 1][None], (fg_classes, N, 4))
        else:
            boxes_c = jnp.transpose(boxes_all.reshape(N, -1, 4)[:, 1:], (1, 0, 2))
        valid = (scores_t > score_thresh) & rois_valid[None, :]
        if softnms:
            idx, ks, kv = jax.vmap(
                lambda b, s, v: soft_nms(b, s, nms_thresh, max_det, v,
                                         score_floor=score_thresh)
            )(boxes_c, scores_t, valid)
            cls_ids = jnp.broadcast_to(
                jnp.arange(1, fg_classes + 1)[:, None], idx.shape)
            kb = jnp.take_along_axis(boxes_c, idx[..., None], axis=1)
            dets = _topk_detections(cls_ids.reshape(-1), ks.reshape(-1),
                                    kb.reshape(-1, 4), kv.reshape(-1), max_det)
        else:
            keep = classwise_nms(boxes_c, scores_t, nms_thresh, score_thresh,
                                 valid=valid, max_keep=max_det)
            cls_ids = jnp.broadcast_to(
                jnp.arange(1, fg_classes + 1)[:, None], keep.shape)
            dets = _topk_detections(cls_ids.reshape(-1), scores_t.reshape(-1),
                                    boxes_c.reshape(-1, 4), keep.reshape(-1),
                                    max_det)
        out.update(dets=dets, cls_prob=cls_prob)
        return out

    return jax.jit(predict)
