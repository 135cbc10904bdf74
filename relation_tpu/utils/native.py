"""ctypes bindings for the native host-side detection library (native/detops.cpp),
with transparent NumPy fallbacks when the .so is absent.

The reference builds its host layer with Cython/CUDA (init.sh -> lib/Makefile);
here `make -C native` produces libdetops.so, auto-built on first import if a
compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO = os.path.join(_NATIVE_DIR, "libdetops.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        _lib = False
        return _lib
    c_f32p = ctypes.POINTER(ctypes.c_float)
    c_u8p = ctypes.POINTER(ctypes.c_uint8)
    c_u32p = ctypes.POINTER(ctypes.c_uint32)
    c_i64p = ctypes.POINTER(ctypes.c_int64)
    lib.bbox_overlaps.argtypes = [c_f32p, ctypes.c_int64, c_f32p,
                                  ctypes.c_int64, c_f32p]
    lib.greedy_nms.restype = ctypes.c_int64
    lib.greedy_nms.argtypes = [c_f32p, ctypes.c_int64, ctypes.c_float, c_i64p]
    lib.soft_nms.restype = ctypes.c_int64
    lib.soft_nms.argtypes = [c_f32p, ctypes.c_int64, ctypes.c_float,
                             ctypes.c_int64, c_i64p, c_f32p]
    lib.rle_encode.restype = ctypes.c_int64
    lib.rle_encode.argtypes = [c_u8p, ctypes.c_int64, ctypes.c_int64, c_u32p,
                               ctypes.c_int64]
    lib.rle_decode.argtypes = [c_u32p, ctypes.c_int64, ctypes.c_int64,
                               ctypes.c_int64, c_u8p]
    lib.rle_area.restype = ctypes.c_uint64
    lib.rle_area.argtypes = [c_u32p, ctypes.c_int64]
    lib.rle_iou.restype = ctypes.c_double
    lib.rle_iou.argtypes = [c_u32p, ctypes.c_int64, c_u32p, ctypes.c_int64,
                            ctypes.c_int]
    # void* + raw .ctypes.data ints: this call runs ~400k times per minival
    # summarize; POINTER casts per call measured ~60% of the wrapper cost
    lib.coco_match_image.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,  # ious, D, G
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int64,                  # thrs, T
        ctypes.c_void_p, ctypes.c_int64,                  # area_rng, A
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    _lib = lib
    return _lib


def have_native() -> bool:
    return bool(_load())


def _ptr(a, ty):
    return a.ctypes.data_as(ty)


def bbox_overlaps(boxes: np.ndarray, query: np.ndarray) -> np.ndarray:
    """[N,K] IoU matrix (+1 convention). Native if available."""
    boxes = np.ascontiguousarray(boxes, np.float32)
    query = np.ascontiguousarray(query, np.float32)
    lib = _load()
    if lib:
        out = np.empty((len(boxes), len(query)), np.float32)
        lib.bbox_overlaps(_ptr(boxes, ctypes.POINTER(ctypes.c_float)),
                          len(boxes),
                          _ptr(query, ctypes.POINTER(ctypes.c_float)),
                          len(query),
                          _ptr(out, ctypes.POINTER(ctypes.c_float)))
        return out
    # vectorized numpy fallback
    bw = boxes[:, 2] - boxes[:, 0] + 1
    bh = boxes[:, 3] - boxes[:, 1] + 1
    qw = query[:, 2] - query[:, 0] + 1
    qh = query[:, 3] - query[:, 1] + 1
    iw = np.clip(np.minimum(boxes[:, None, 2], query[None, :, 2]) -
                 np.maximum(boxes[:, None, 0], query[None, :, 0]) + 1, 0, None)
    ih = np.clip(np.minimum(boxes[:, None, 3], query[None, :, 3]) -
                 np.maximum(boxes[:, None, 1], query[None, :, 1]) + 1, 0, None)
    inter = iw * ih
    union = (bw * bh)[:, None] + (qw * qh)[None, :] - inter
    return np.where(inter > 0, inter / np.maximum(union, 1e-12),
                    0.0).astype(np.float32)


def greedy_nms(dets: np.ndarray, thresh: float) -> np.ndarray:
    """Kept indices in pick order. dets [N,5]."""
    dets = np.ascontiguousarray(dets, np.float32)
    lib = _load()
    if lib:
        keep = np.empty(len(dets), np.int64)
        n = lib.greedy_nms(_ptr(dets, ctypes.POINTER(ctypes.c_float)),
                           len(dets), thresh,
                           _ptr(keep, ctypes.POINTER(ctypes.c_int64)))
        return keep[:n]
    order = dets[:, 4].argsort(kind="stable")[::-1]
    keep, sup = [], np.zeros(len(dets), bool)
    area = (dets[:, 2] - dets[:, 0] + 1) * (dets[:, 3] - dets[:, 1] + 1)
    for i in order:
        if sup[i]:
            continue
        keep.append(i)
        iw = np.clip(np.minimum(dets[i, 2], dets[:, 2]) -
                     np.maximum(dets[i, 0], dets[:, 0]) + 1, 0, None)
        ih = np.clip(np.minimum(dets[i, 3], dets[:, 3]) -
                     np.maximum(dets[i, 1], dets[:, 1]) + 1, 0, None)
        inter = iw * ih
        ov = inter / (area[i] + area - inter)
        sup |= ov > thresh
        sup[i] = True
    return np.asarray(keep, np.int64)


def soft_nms(dets: np.ndarray, sigma: float, max_dets: int = -1):
    """(kept indices, decayed scores)."""
    dets = np.ascontiguousarray(dets, np.float32)
    lib = _load()
    cap = len(dets) if max_dets < 0 else min(max_dets, len(dets))
    if lib:
        keep = np.empty(cap, np.int64)
        sc = np.empty(cap, np.float32)
        n = lib.soft_nms(_ptr(dets, ctypes.POINTER(ctypes.c_float)), len(dets),
                         sigma, cap, _ptr(keep, ctypes.POINTER(ctypes.c_int64)),
                         _ptr(sc, ctypes.POINTER(ctypes.c_float)))
        return keep[:n], sc[:n]
    score = dets[:, 4].copy()
    area = (dets[:, 2] - dets[:, 0] + 1) * (dets[:, 3] - dets[:, 1] + 1)
    dead = np.zeros(len(dets), bool)
    keep, scores = [], []
    while len(keep) < cap:
        live = np.where(~dead)[0]
        if not len(live):
            break
        i = live[score[live].argmax()]
        keep.append(i)
        scores.append(score[i])
        dead[i] = True
        iw = np.clip(np.minimum(dets[i, 2], dets[:, 2]) -
                     np.maximum(dets[i, 0], dets[:, 0]) + 1, 0, None)
        ih = np.clip(np.minimum(dets[i, 3], dets[:, 3]) -
                     np.maximum(dets[i, 1], dets[:, 1]) + 1, 0, None)
        inter = iw * ih
        ov = inter / (area[i] + area - inter)
        score[~dead] *= np.exp(-(ov[~dead] ** 2) / sigma)
    return np.asarray(keep, np.int64), np.asarray(scores, np.float32)


def coco_match_image(ious: np.ndarray, gt_area: np.ndarray,
                     gt_crowd: np.ndarray, det_area: np.ndarray,
                     thrs: np.ndarray, area_rng: np.ndarray):
    """Greedy COCO matching for one (image, class) over all area ranges and
    IoU thresholds in one native call (cocoeval.evaluateImg semantics; see
    native/detops.cpp). Returns (matched [A,T,D] bool, ignored [A,T,D] bool,
    num_gt [A] int64), or None when the native lib is unavailable — the caller
    (data/eval.py) falls back to its pure-Python matcher."""
    lib = _load()
    if not lib:
        return None
    D, G = ious.shape
    A = len(area_rng)
    T = len(thrs)
    # callers (data/eval.py) pass correctly-typed contiguous arrays; require()
    # is a no-op view check then, not a copy
    ious = np.require(ious, np.float64, "C")
    gt_area = np.require(gt_area, np.float64, "C")
    gt_crowd = np.require(gt_crowd, np.uint8, "C")
    det_area = np.require(det_area, np.float64, "C")
    thrs = np.require(thrs, np.float64, "C")
    area_rng = np.require(area_rng, np.float64, "C")
    matched = np.empty((A, T, D), np.uint8)
    ignored = np.empty((A, T, D), np.uint8)
    num_gt = np.empty((A,), np.int64)
    lib.coco_match_image(ious.ctypes.data, D, G, gt_area.ctypes.data,
                         gt_crowd.ctypes.data, det_area.ctypes.data,
                         thrs.ctypes.data, T, area_rng.ctypes.data, A,
                         matched.ctypes.data, ignored.ctypes.data,
                         num_gt.ctypes.data)
    return matched.view(bool), ignored.view(bool), num_gt


def rle_encode(mask: np.ndarray) -> np.ndarray:
    """COCO RLE counts from a [h, w] binary mask (column-major runs)."""
    mask = np.ascontiguousarray(mask.T.reshape(-1), np.uint8)  # column-major
    h, w = mask.size, 1  # flattened; pass real dims for bounds only
    lib = _load()
    if lib:
        counts = np.empty(mask.size + 1, np.uint32)
        m = lib.rle_encode(_ptr(mask, ctypes.POINTER(ctypes.c_uint8)),
                           mask.size, 1,
                           _ptr(counts, ctypes.POINTER(ctypes.c_uint32)),
                           counts.size)
        return counts[:m].copy()
    # numpy fallback
    diff = np.nonzero(np.diff(mask))[0] + 1
    bounds = np.concatenate([[0], diff, [mask.size]])
    counts = np.diff(bounds)
    if mask[0] == 1:
        counts = np.concatenate([[0], counts])
    return counts.astype(np.uint32)


def rle_decode(counts: np.ndarray, h: int, w: int) -> np.ndarray:
    counts = np.ascontiguousarray(counts, np.uint32)
    lib = _load()
    if lib:
        out = np.empty(h * w, np.uint8)
        lib.rle_decode(_ptr(counts, ctypes.POINTER(ctypes.c_uint32)),
                       len(counts), h, w,
                       _ptr(out, ctypes.POINTER(ctypes.c_uint8)))
        return out.reshape(w, h).T
    flat = np.zeros(h * w, np.uint8)
    pos, v = 0, 0
    for c in counts:
        flat[pos:pos + int(c)] = v
        pos += int(c)
        v = 1 - v
    return flat.reshape(w, h).T


def rle_iou(counts_a: np.ndarray, counts_b: np.ndarray,
            iscrowd: bool = False) -> float:
    lib = _load()
    a = np.ascontiguousarray(counts_a, np.uint32)
    b = np.ascontiguousarray(counts_b, np.uint32)
    if lib:
        return float(lib.rle_iou(
            _ptr(a, ctypes.POINTER(ctypes.c_uint32)), len(a),
            _ptr(b, ctypes.POINTER(ctypes.c_uint32)), len(b), int(iscrowd)))
    # decode-based fallback (sizes must match)
    n = int(a.sum())
    ma = rle_decode(a, n, 1).reshape(-1).astype(bool)
    mb = rle_decode(b, n, 1).reshape(-1).astype(bool)
    inter = float(np.sum(ma & mb))
    denom = float(np.sum(ma)) if iscrowd else float(np.sum(ma | mb))
    return inter / denom if denom else 0.0
