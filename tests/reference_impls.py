"""Pure-NumPy oracles for the numeric core, written against the documented semantics
of the reference implementation (SURVEY.md §4 lists these as the natural oracles:
lib/bbox/bbox_transform.py formulas, lib/nms/nms.py greedy/soft NMS, etc.).
Used only by tests."""

import numpy as np


def np_bbox_transform(ex_rois, gt_rois):
    ex_w = ex_rois[:, 2] - ex_rois[:, 0] + 1.0
    ex_h = ex_rois[:, 3] - ex_rois[:, 1] + 1.0
    ex_cx = ex_rois[:, 0] + 0.5 * (ex_w - 1.0)
    ex_cy = ex_rois[:, 1] + 0.5 * (ex_h - 1.0)
    gt_w = gt_rois[:, 2] - gt_rois[:, 0] + 1.0
    gt_h = gt_rois[:, 3] - gt_rois[:, 1] + 1.0
    gt_cx = gt_rois[:, 0] + 0.5 * (gt_w - 1.0)
    gt_cy = gt_rois[:, 1] + 0.5 * (gt_h - 1.0)
    dx = (gt_cx - ex_cx) / (ex_w + 1e-14)
    dy = (gt_cy - ex_cy) / (ex_h + 1e-14)
    dw = np.log(gt_w / ex_w)
    dh = np.log(gt_h / ex_h)
    return np.stack([dx, dy, dw, dh], axis=1)


def np_bbox_pred(boxes, deltas):
    w = boxes[:, 2] - boxes[:, 0] + 1.0
    h = boxes[:, 3] - boxes[:, 1] + 1.0
    cx = boxes[:, 0] + 0.5 * (w - 1.0)
    cy = boxes[:, 1] + 0.5 * (h - 1.0)
    dx = deltas[:, 0::4]
    dy = deltas[:, 1::4]
    dw = deltas[:, 2::4]
    dh = deltas[:, 3::4]
    pcx = dx * w[:, None] + cx[:, None]
    pcy = dy * h[:, None] + cy[:, None]
    pw = np.exp(dw) * w[:, None]
    ph = np.exp(dh) * h[:, None]
    out = np.zeros_like(deltas)
    out[:, 0::4] = pcx - 0.5 * (pw - 1.0)
    out[:, 1::4] = pcy - 0.5 * (ph - 1.0)
    out[:, 2::4] = pcx + 0.5 * (pw - 1.0)
    out[:, 3::4] = pcy + 0.5 * (ph - 1.0)
    return out


def np_bbox_overlaps(boxes, query):
    n, k = boxes.shape[0], query.shape[0]
    out = np.zeros((n, k))
    for j in range(k):
        qa = (query[j, 2] - query[j, 0] + 1) * (query[j, 3] - query[j, 1] + 1)
        for i in range(n):
            iw = min(boxes[i, 2], query[j, 2]) - max(boxes[i, 0], query[j, 0]) + 1
            if iw > 0:
                ih = min(boxes[i, 3], query[j, 3]) - max(boxes[i, 1], query[j, 1]) + 1
                if ih > 0:
                    ba = (boxes[i, 2] - boxes[i, 0] + 1) * (boxes[i, 3] - boxes[i, 1] + 1)
                    out[i, j] = iw * ih / float(ba + qa - iw * ih)
    return out


def np_greedy_nms(dets, thresh):
    """Sequential greedy NMS, returns kept indices in pick order."""
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        inds = np.where(ovr <= thresh)[0]
        order = order[inds + 1]
    return keep


def np_generate_anchors(base_size=16, ratios=(0.5, 1, 2), scales=(8, 16, 32)):
    ratios = np.array(ratios, dtype=float)
    scales = np.array(scales, dtype=float)
    base = np.array([1, 1, base_size, base_size], dtype=float) - 1
    w = base[2] - base[0] + 1
    h = base[3] - base[1] + 1
    x_ctr = base[0] + 0.5 * (w - 1)
    y_ctr = base[1] + 0.5 * (h - 1)
    size = w * h
    ws = np.round(np.sqrt(size / ratios))
    hs = np.round(ws * ratios)
    out = []
    for wr, hr in zip(ws, hs):
        sw = wr * scales
        sh = hr * scales
        out.append(np.stack([x_ctr - 0.5 * (sw - 1), y_ctr - 0.5 * (sh - 1),
                             x_ctr + 0.5 * (sw - 1), y_ctr + 0.5 * (sh - 1)], axis=1))
    return np.concatenate(out, axis=0)


def np_roi_pool(feat_hwc, rois, spatial_scale, pooled=7):
    """MXNet v1.x ROIPooling forward (roi_pooling-inl.h ROIPoolForward):
    rounded coords, +1 sizes, floor/ceil integer bin edges, max over cells,
    empty bins -> 0. feat [H, W, C]; rois [R, 4] -> [R, P, P, C].

    Faithful to the CUDA kernel's numerics: Dtype=float32 throughout (the
    f32 bin_size products shift ceil/floor edges vs exact math) and C
    ``round`` = half away from zero (not banker's)."""
    H, W, C = feat_hwc.shape
    P = pooled
    f32 = np.float32
    out = np.zeros((len(rois), P, P, C), feat_hwc.dtype)

    def c_round(v):
        return int(np.floor(f32(v) + f32(np.copysign(0.5, v))))

    for r, (x1, y1, x2, y2) in enumerate(np.asarray(rois, f32)):
        sw = c_round(x1 * f32(spatial_scale))
        sh = c_round(y1 * f32(spatial_scale))
        ew = c_round(x2 * f32(spatial_scale))
        eh = c_round(y2 * f32(spatial_scale))
        rh = max(eh - sh + 1, 1)
        rw = max(ew - sw + 1, 1)
        bh, bw = f32(rh) / f32(P), f32(rw) / f32(P)
        for ph in range(P):
            for pw in range(P):
                hs = min(max(int(np.floor(f32(ph) * bh)) + sh, 0), H)
                he = min(max(int(np.ceil(f32(ph + 1) * bh)) + sh, 0), H)
                ws = min(max(int(np.floor(f32(pw) * bw)) + sw, 0), W)
                we = min(max(int(np.ceil(f32(pw + 1) * bw)) + sw, 0), W)
                if he <= hs or we <= ws:
                    continue
                out[r, ph, pw] = feat_hwc[hs:he, ws:we].reshape(-1, C).max(0)
    return out
