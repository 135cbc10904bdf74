"""Exact-ROIPooling parity tests (reference mxnet ROIPooling semantics,
symbols/resnet_v1_101_rcnn_base.py:790-791 / mxnet roi_pooling-inl.h).

The oracle ``np_roi_pool`` replicates the CUDA kernel's f32 numerics (f32
bin-size products, C half-away-from-zero rounding); the TPU implementation
must match it bit-exactly UNDER JIT — XLA's divide->reciprocal rewrite and
approximate exp2 both broke this historically (see ops/roi_pool.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from relation_tpu.ops.roi_pool import roi_pool, roi_align_mxu, _f32_div_int
from tests.reference_impls import np_roi_pool


def clipped_rois(rng, n, H, W, stride=16):
    """Random ROIs clipped the way the proposal pipeline clips them
    (reference bbox_transform.py clip_boxes: to [0, imsize-1])."""
    x1 = rng.uniform(-10, W * stride, n)
    y1 = rng.uniform(-10, H * stride, n)
    x2 = x1 + rng.uniform(1, W * stride, n)
    y2 = y1 + rng.uniform(1, H * stride, n)
    rois = np.stack([x1, y1, x2, y2], 1).astype(np.float32)
    rois[:, 0::2] = np.clip(rois[:, 0::2], 0, W * stride - 1)
    rois[:, 1::2] = np.clip(rois[:, 1::2], 0, H * stride - 1)
    return rois


def test_f32_div_exhaustive():
    # correctly-rounded f32 division emulated in int32 (jit-stable); cover all
    # feature-map-scale numerators against numpy's IEEE division
    n = np.arange(1, 4097, dtype=np.int32)
    for d in (1, 2, 3, 6, 7, 14):
        want = (n.astype(np.float32) / np.float32(d)).astype(np.float32)
        got = np.asarray(_f32_div_int(jnp.asarray(n), d))
        assert np.array_equal(want, got), f"d={d}"


def test_roi_pool_matches_reference_oracle(rng):
    H, W, C = 38, 63, 8
    feat = rng.randn(H, W, C).astype(np.float32)
    rois = clipped_rois(np.random.default_rng(0), 64, H, W)
    want = np_roi_pool(feat, rois, 1.0 / 16, 7)
    got = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(rois), 1.0 / 16, 7))
    np.testing.assert_array_equal(got, want)


def test_roi_pool_divisible_roi_edges(rng):
    # roi_h/w divisible by P: true f32 division gives integral bin sizes; the
    # reciprocal-multiply rewrite historically shifted every ceil edge here
    H, W, C = 38, 63, 4
    feat = rng.randn(H, W, C).astype(np.float32)
    # rh = 21 (= 3*7) in feature cells, rw = 27
    rois = np.array([[592.23364, 259.00854, 1007.0, 573.4533],
                     [16.0, 16.0, 16 * 21.0, 16 * 21.0],
                     [0.0, 0.0, 16 * 7 - 8.0, 16 * 14 - 8.0]], np.float32)
    want = np_roi_pool(feat, rois, 1.0 / 16, 7)
    got = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(rois), 1.0 / 16, 7))
    np.testing.assert_array_equal(got, want)


def test_roi_pool_tiny_and_degenerate(rng):
    # sub-bin ROIs produce empty bins -> exact zeros (roi_pooling-inl.h: is_empty)
    H, W, C = 16, 16, 4
    feat = rng.randn(H, W, C).astype(np.float32) + 10.0   # keep values > 0
    rois = np.array([[8.0, 8.0, 9.0, 9.0],       # 1x1 feature cell
                     [0.0, 0.0, 0.5, 0.5],       # degenerate
                     [8.0, 250.0, 40.0, 255.0],  # rounds past the map bottom
                     [100.0, 100.0, 180.0, 180.0]], np.float32)
    want = np_roi_pool(feat, rois, 1.0 / 16, 7)
    got = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(rois), 1.0 / 16, 7))
    np.testing.assert_array_equal(got, want)
    assert (want == 0).any()                      # the case actually hit empties


@pytest.mark.parametrize("P", [3, 7])
def test_roi_pool_pooled_sizes(rng, P):
    H, W, C = 25, 40, 8
    feat = rng.randn(H, W, C).astype(np.float32)
    rois = clipped_rois(np.random.default_rng(P), 32, H, W)
    want = np_roi_pool(feat, rois, 1.0 / 16, P)
    got = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(rois), 1.0 / 16, P))
    np.testing.assert_array_equal(got, want)


def test_roi_pool_grad_flows(rng):
    # the parity path is eval-first but must not break a grad trace (subgradient
    # of max via the gather is fine)
    H, W, C = 10, 12, 2
    feat = rng.randn(H, W, C).astype(np.float32)
    rois = np.array([[0.0, 0.0, 100.0, 100.0]], np.float32)
    g = jax.grad(lambda f: roi_pool(f, jnp.asarray(rois), 1.0 / 16, 7).sum())(
        jnp.asarray(feat))
    assert np.isfinite(np.asarray(g)).all()
    assert np.asarray(g).sum() > 0


def test_roi_align_mxu_still_matches_gather_form(rng):
    # regression guard: the MXU-matmul ROIAlign against the sampling definition
    from relation_tpu.ops.roi_pool import roi_align
    H, W, C = 20, 24, 8
    feat = rng.randn(H, W, C).astype(np.float32)
    rois = clipped_rois(np.random.default_rng(3), 16, H, W)
    a = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 1.0 / 16, 7))
    b = np.asarray(roi_align_mxu(jnp.asarray(feat), jnp.asarray(rois), 1.0 / 16, 7))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_roi_align_mxu_custom_vjp_matches_autodiff(rng):
    """The hand-written backward (bf16-staged cotangent on TPU, zero ROI
    grads by contract) must equal autodiff of the forward algebra w.r.t. the
    feature map (f32 on CPU -> exact up to reduction order)."""
    import jax
    import jax.numpy as jnp
    from relation_tpu.ops.roi_pool import roi_align_mxu, _align_core_fwd

    H, W, C, R, P, S = 10, 14, 8, 6, 7, 2
    feat = jnp.asarray(rng.randn(H, W, C).astype(np.float32))
    rois = np.stack([
        rng.uniform(0, W * 4 - 20, R), rng.uniform(0, H * 4 - 20, R),
        np.full(R, 18.0), np.full(R, 16.0)], axis=1).astype(np.float32)
    rois[:, 2] += rois[:, 0]
    rois[:, 3] += rois[:, 1]
    rois = jnp.asarray(rois)
    dout = rng.randn(R, P, P, C).astype(np.float32)

    # By/Bx rebuilt exactly as roi_align_mxu builds them (spatial_scale 0.25)
    x1, y1 = rois[:, 0] * 0.25, rois[:, 1] * 0.25
    roi_w = jnp.maximum(rois[:, 2] * 0.25 - x1, 1.0)
    roi_h = jnp.maximum(rois[:, 3] * 0.25 - y1, 1.0)
    grid = (jnp.arange(P * S, dtype=jnp.float32) + 0.5) / S
    ys = jnp.clip(y1[:, None] + (roi_h / P)[:, None] * grid[None, :], 0, H - 1.0)
    xs = jnp.clip(x1[:, None] + (roi_w / P)[:, None] * grid[None, :], 0, W - 1.0)

    def interp(coords, dim):
        g = jnp.arange(dim, dtype=jnp.float32)
        w = jnp.maximum(1.0 - jnp.abs(coords[..., None] - g), 0.0)
        return w.reshape(R, P, S, dim).mean(axis=2)

    By, Bx = interp(ys, H), interp(xs, W)

    def loss(f):
        return jnp.sum(roi_align_mxu(f, rois, 0.25) * dout)

    def loss_auto(f):
        out, _ = _align_core_fwd(f, By, Bx)
        return jnp.sum(out * dout)

    np.testing.assert_allclose(np.asarray(loss(feat)),
                               np.asarray(loss_auto(feat)), rtol=1e-5)
    g_custom = jax.grad(loss)(feat)
    g_auto = jax.grad(loss_auto)(feat)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_auto),
                               rtol=2e-5, atol=2e-5)
