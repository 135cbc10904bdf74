"""Host-side image pipeline: load, resize, mean-subtract, flip, bucket-pad.

Mirrors the reference semantics (lib/utils/image.py:18-196):
- resize so the short side hits SCALES[0][0] without the long side exceeding
  SCALES[0][1] (min(target/short, max/long) scaling)
- pixels kept in BGR channel order, PIXEL_MEANS subtracted (the reference's
  pixel means are BGR: yaml 103.06/115.90/123.15)
- horizontal flip flips boxes with the +1 convention (x1' = W - x2 - 1)

TPU-native addition: every image is zero-padded into a fixed (H, W) bucket so each
bucket compiles exactly once; im_info carries the true (h, w, scale).
"""

from __future__ import annotations

import numpy as np

try:
    from PIL import Image
    _HAS_PIL = True
except ImportError:          # pragma: no cover
    _HAS_PIL = False


def load_image_bgr(path: str) -> np.ndarray:
    """Read an image file -> uint8 [H, W, 3] BGR (kept uint8 through resize;
    the f32 cast happens at mean-sub, host- or device-side — see resize_im)."""
    if not _HAS_PIL:
        raise RuntimeError("PIL unavailable")
    with Image.open(path) as im:
        rgb = np.asarray(im.convert("RGB"), dtype=np.uint8)
    return rgb[:, :, ::-1]


def resize_im(im: np.ndarray, target_size: int, max_size: int):
    """Scale so short side == target_size unless the long side would exceed
    max_size (reference lib/utils/image.py resize)."""
    h, w = im.shape[:2]
    im_size_min = min(h, w)
    im_size_max = max(h, w)
    scale = float(target_size) / im_size_min
    if round(scale * im_size_max) > max_size:
        scale = float(max_size) / im_size_max
    if _HAS_PIL:
        # uint8 out: the f32 cast happens in transform() (host mean-sub path)
        # or on device (TPU.H2D_UINT8 — predictor._image_from_u8); uint8->f32
        # is exact, so both paths see bit-identical pixels
        out = np.asarray(Image.fromarray(im.astype(np.uint8)).resize(
            (int(round(w * scale)), int(round(h * scale))), Image.BILINEAR),
            dtype=np.uint8)
    else:                      # pragma: no cover
        out = im.astype(np.uint8)
    return out, scale


def transform(im_bgr: np.ndarray, pixel_means) -> np.ndarray:
    """Mean subtraction, stays HWC/BGR float32 (NHWC is the TPU layout; the
    reference's CHW transpose is an MXNet artifact)."""
    return im_bgr.astype(np.float32) - np.asarray(pixel_means, np.float32)


def flip_boxes(boxes: np.ndarray, width: int) -> np.ndarray:
    """Horizontal flip with the +1 convention (reference lib/dataset/imdb.py:236-239)."""
    out = boxes.copy()
    out[:, 0] = width - boxes[:, 2] - 1
    out[:, 2] = width - boxes[:, 0] - 1
    return out


def pick_bucket(h: int, w: int, buckets) -> tuple[int, int]:
    """Smallest (H, W) bucket that fits; falls back to the largest."""
    for bh, bw in sorted(buckets):
        if h <= bh and w <= bw:
            return (bh, bw)
    return tuple(sorted(buckets)[-1])


def pad_to_bucket(im: np.ndarray, bucket: tuple[int, int]) -> np.ndarray:
    bh, bw = bucket
    h, w = im.shape[:2]
    if h > bh or w > bw:
        # never crop silently: a SCALES/IMAGE_BUCKETS mismatch would truncate
        # pixels while gt boxes keep pointing off-image. Unreachable with the
        # default SCALES (600, 1000) vs the (1024, 1024) top bucket — reaching
        # this means the config needs a bigger TPU.IMAGE_BUCKETS entry.
        raise ValueError(
            f"resized image ({h}x{w}) exceeds the largest image bucket "
            f"({bh}x{bw}); extend cfg.TPU.IMAGE_BUCKETS to cover "
            f"cfg.SCALES (a silent crop would corrupt detections/gt)")
    out = np.zeros((bh, bw) + im.shape[2:], dtype=im.dtype)
    out[:h, :w] = im
    return out


def prepare_image(im_bgr: np.ndarray, target_size: int, max_size: int,
                  pixel_means, buckets, flip: bool = False,
                  boxes: np.ndarray | None = None):
    """Full path: (resize, optional flip, mean-sub, bucket-pad).
    Returns (image [bH,bW,3], im_info [3], boxes scaled (and flipped)).

    ``pixel_means=None`` keeps the image uint8 (no mean-sub): the H2D-lean
    eval layout — 4x fewer bytes over the host<->device link, with the exact
    mean-sub + pad-zeroing done on device (core/predictor._image_from_u8).
    """
    if flip:
        im_bgr = im_bgr[:, ::-1, :]
    im, scale = resize_im(im_bgr, target_size, max_size)
    h, w = im.shape[:2]
    if pixel_means is not None:
        im = transform(im, pixel_means)
    bucket = pick_bucket(h, w, buckets)
    im = pad_to_bucket(im, bucket)
    im_info = np.asarray([h, w, scale], np.float32)
    out_boxes = None
    if boxes is not None:
        out_boxes = boxes.copy().astype(np.float32)
        if flip:
            out_boxes[:, :4] = flip_boxes(out_boxes[:, :4],
                                          int(im_bgr.shape[1]))
        out_boxes[:, :4] *= scale
    return im, im_info, out_boxes


def to_s2d_planar(im_hwc: np.ndarray) -> np.ndarray:
    """Host-side space-to-depth: [H, W, C] -> [4C, H/2, W/2], channel order
    (row-phase, col-phase, c). The TPU-first input layout: a [H, W, 3] image is
    lane-padded 3->128 on device (~42x HBM waste, ~1 ms per touch at 608x1024);
    the s2d planar form is dense and the backbone stem consumes it directly
    (models/backbone.py::ResNet101C4). Bucket H, W are even by construction."""
    H, W, C = im_hwc.shape
    return np.ascontiguousarray(
        im_hwc.reshape(H // 2, 2, W // 2, 2, C)
        .transpose(1, 3, 4, 0, 2)
        .reshape(4 * C, H // 2, W // 2))


def batch_image_hw(batch_image) -> tuple[int, int]:
    """Original (H, W) of a batched image tensor in either loader layout:
    s2d planar [B, 12, H/2, W/2] (TPU.S2D_INPUT, to_s2d_planar) or NHWC
    [B, H, W, 3]. The train driver derives the RPN feature grid from this —
    reading shape[1]/shape[2] directly silently yields a 0-height grid for
    planar batches."""
    if (batch_image.ndim == 4 and batch_image.shape[1] == 12
            and batch_image.shape[-1] != 3):
        # trailing-dim check disambiguates an NHWC batch that happens to have
        # H == 12 (planar W/2 == 3 would mean a 6-px-wide image — impossible
        # for any bucket)
        return batch_image.shape[2] * 2, batch_image.shape[3] * 2
    return batch_image.shape[1], batch_image.shape[2]


def image_hw(image) -> tuple[int, int]:
    """Original (H, W) of ONE image in either layout: s2d planar
    [12, H/2, W/2] or HWC [H, W, 3] (single-image analogue of
    :func:`batch_image_hw`; the evaluator keys compiled programs on this)."""
    if image.ndim == 3 and image.shape[0] == 12 and image.shape[-1] != 3:
        return image.shape[1] * 2, image.shape[2] * 2
    return image.shape[0], image.shape[1]
