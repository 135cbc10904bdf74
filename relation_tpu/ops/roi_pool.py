"""ROI feature extraction on TPU: ROIAlign (default) and exact ROIPooling.

The reference's non-DCN heads use MXNet's CUDA ``mx.symbol.ROIPooling`` — a rounding,
max-pooling ROI pool (reference symbols/resnet_v1_101_rcnn_base.py:790-791, pooled 7x7,
spatial_scale=0.0625). On TPU both variants here are expressed as batched gathers from
the NHWC feature map, which XLA lowers to coalesced HBM reads; there is no dynamic
shape anywhere (padded ROI sets ride through, garbage rows are masked downstream).

- ``roi_align``: bilinear-sampled pooling (avg or max over a fixed sample grid). This
  is the TPU-native default: regular access pattern, differentiable, and empirically
  at-or-above ROIPooling accuracy.
- ``roi_pool``: exact MXNet ROIPooling semantics (round coords, floor/ceil bin edges,
  max over cells) for numerical parity with converted reference weights. Implemented
  with a bounded per-bin window; cost grows with ``max_bin`` so prefer roi_align in
  production.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _bilinear_gather(feat: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of NHWC-less feature map feat [H, W, C] at float coords.

    y, x: [...]; returns [..., C]. Out-of-range samples are clamped (standard
    ROIAlign behavior for sampling points outside after clipping).
    """
    H, W, _ = feat.shape
    y = jnp.clip(y, 0.0, H - 1.0)
    x = jnp.clip(x, 0.0, W - 1.0)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1 = jnp.minimum(y0 + 1, H - 1.0)
    x1 = jnp.minimum(x0 + 1, W - 1.0)
    ly = y - y0
    lx = x - x0

    flat = feat.reshape(H * W, -1)

    def take(yy, xx):
        idx = (yy.astype(jnp.int32) * W + xx.astype(jnp.int32)).reshape(-1)
        return flat[idx].reshape(y.shape + (feat.shape[-1],))

    v00 = take(y0, x0)
    v01 = take(y0, x1)
    v10 = take(y1, x0)
    v11 = take(y1, x1)
    w00 = ((1 - ly) * (1 - lx))[..., None]
    w01 = ((1 - ly) * lx)[..., None]
    w10 = (ly * (1 - lx))[..., None]
    w11 = (ly * lx)[..., None]
    return v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11


@functools.partial(jax.jit, static_argnames=("pooled_size", "sampling_ratio", "mode"))
def roi_align(feat: jnp.ndarray, rois: jnp.ndarray, spatial_scale: float,
              pooled_size: int = 7, sampling_ratio: int = 2,
              mode: str = "avg") -> jnp.ndarray:
    """ROIAlign over one image's feature map.

    feat: [H, W, C]; rois: [R, 4] (x1, y1, x2, y2) in image coords.
    Returns [R, pooled_size, pooled_size, C].
    """
    R = rois.shape[0]
    P, S = pooled_size, sampling_ratio

    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    x2 = rois[:, 2] * spatial_scale
    y2 = rois[:, 3] * spatial_scale
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / P
    bin_h = roi_h / P

    # sample grid: P*S points per axis, centered within each sub-bin
    grid = (jnp.arange(P * S, dtype=jnp.float32) + 0.5) / S    # [P*S] in bin units
    ys = y1[:, None] + bin_h[:, None] * grid[None, :]          # [R, P*S]
    xs = x1[:, None] + bin_w[:, None] * grid[None, :]          # [R, P*S]

    yy = jnp.broadcast_to(ys[:, :, None], (R, P * S, P * S))
    xx = jnp.broadcast_to(xs[:, None, :], (R, P * S, P * S))
    samples = _bilinear_gather(feat, yy, xx)                   # [R, P*S, P*S, C]
    samples = samples.reshape(R, P, S, P, S, -1)
    if mode == "avg":
        return samples.mean(axis=(2, 4))
    elif mode == "max":
        return samples.max(axis=(2, 4))
    raise ValueError(mode)


@functools.partial(jax.jit, static_argnames=("pooled_size", "sampling_ratio"))
def roi_align_mxu(feat: jnp.ndarray, rois: jnp.ndarray, spatial_scale: float,
                  pooled_size: int = 7, sampling_ratio: int = 2) -> jnp.ndarray:
    """ROIAlign (avg mode) as two per-ROI interpolation matmuls — zero gathers.

    Key identity: bilinear sampling + bin averaging is linear in the feature map
    and separable per axis, so

        out[r, p, q, c] = By[r, p, :] @ feat[:, :, c] @ Bx[r, :, q]

    where By[r, p, y] sums the y-axis bilinear weights of the bin's sample rows
    (each sample row y_s contributes relu(1 - |y - y_s|) / S) and Bx likewise.
    Both matmuls ride the MXU; the random-access gather of the naive formulation
    (the dominant cost on TPU — measured 1.5 ms vs ~0.2 ms for this form at
    300 ROIs on a 38x64x256 map) disappears entirely.

    Numerically identical to roi_align(mode="avg") up to float association.
    """
    H, W, C = feat.shape
    R = rois.shape[0]
    P, S = pooled_size, sampling_ratio

    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    x2 = rois[:, 2] * spatial_scale
    y2 = rois[:, 3] * spatial_scale
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / P
    bin_h = roi_h / P

    grid = (jnp.arange(P * S, dtype=jnp.float32) + 0.5) / S      # [P*S] bin units
    ys = y1[:, None] + bin_h[:, None] * grid[None, :]            # [R, P*S]
    xs = x1[:, None] + bin_w[:, None] * grid[None, :]
    ys = jnp.clip(ys, 0.0, H - 1.0)
    xs = jnp.clip(xs, 0.0, W - 1.0)

    def interp_matrix(coords, dim):
        # [R, P*S, dim]: bilinear hat weights of each sample against the grid
        g = jnp.arange(dim, dtype=jnp.float32)
        w = jnp.maximum(1.0 - jnp.abs(coords[..., None] - g), 0.0)
        # average the S samples of each bin -> [R, P, dim]
        return w.reshape(R, P, S, dim).mean(axis=2)

    By = interp_matrix(ys, H)                                    # [R, P, H]
    Bx = interp_matrix(xs, W)                                    # [R, P, W]

    dt = jnp.bfloat16 if feat.dtype == jnp.bfloat16 else jnp.float32
    a = jnp.einsum("rph,hwc->rpwc", By.astype(dt), feat.astype(dt),
                   preferred_element_type=jnp.float32)           # [R, P, W, C]
    out = jnp.einsum("rpwc,rqw->rpqc", a, Bx.astype(dt),
                     preferred_element_type=jnp.float32)
    return out.astype(feat.dtype)


@functools.partial(jax.jit, static_argnames=("pooled_size", "max_bin"))
def roi_pool(feat: jnp.ndarray, rois: jnp.ndarray, spatial_scale: float,
             pooled_size: int = 7, max_bin: int = 12) -> jnp.ndarray:
    """Exact MXNet/Caffe ROIPooling (max pool with rounded coords).

    Semantics of mxnet v1.1.0 ROIPooling (used at reference
    symbols/resnet_v1_101_rcnn_base.py:790-791):
      roi_start = round(coord * scale); roi_size = max(end - start + 1, 1)
      bin edges: floor(p * size/P) .. ceil((p+1) * size/P), clipped to the map;
      empty bins yield 0.

    ``max_bin`` bounds the per-bin window (cells per bin <= ceil(feat_dim/P)+1);
    with a 64x64 stride-16 map and P=7, 11 suffices — 12 leaves margin.
    feat: [H, W, C]; rois: [R, 4] -> [R, P, P, C].
    """
    H, W, C = feat.shape
    P = pooled_size
    R = rois.shape[0]

    start_w = jnp.round(rois[:, 0] * spatial_scale)
    start_h = jnp.round(rois[:, 1] * spatial_scale)
    end_w = jnp.round(rois[:, 2] * spatial_scale)
    end_h = jnp.round(rois[:, 3] * spatial_scale)
    roi_h = jnp.maximum(end_h - start_h + 1.0, 1.0)            # [R]
    roi_w = jnp.maximum(end_w - start_w + 1.0, 1.0)
    bin_h = roi_h / P
    bin_w = roi_w / P

    p = jnp.arange(P, dtype=jnp.float32)
    hstart = jnp.floor(p[None, :] * bin_h[:, None]) + start_h[:, None]   # [R, P]
    hend = jnp.ceil((p[None, :] + 1) * bin_h[:, None]) + start_h[:, None]
    wstart = jnp.floor(p[None, :] * bin_w[:, None]) + start_w[:, None]
    wend = jnp.ceil((p[None, :] + 1) * bin_w[:, None]) + start_w[:, None]
    hstart = jnp.clip(hstart, 0, H)
    hend = jnp.clip(hend, 0, H)
    wstart = jnp.clip(wstart, 0, W)
    wend = jnp.clip(wend, 0, W)

    flat = feat.reshape(H * W, C)
    neg = jnp.finfo(feat.dtype).min

    out = jnp.full((R, P, P, C), neg, dtype=feat.dtype)
    for dy in range(max_bin):
        for dx in range(max_bin):
            yy = hstart + dy                                    # [R, P]
            xx = wstart + dx
            in_h = yy < hend                                    # [R, P]
            in_w = xx < wend
            m = (in_h[:, :, None] & in_w[:, None, :])           # [R, P, P]
            yi = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
            xi = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
            idx = yi[:, :, None] * W + xi[:, None, :]           # [R, P, P]
            vals = flat[idx.reshape(-1)].reshape(R, P, P, C)
            out = jnp.maximum(out, jnp.where(m[..., None], vals, neg))

    empty = (hend <= hstart)[:, :, None] | (wend <= wstart)[:, None, :]
    return jnp.where(empty[..., None], 0.0, out)
