"""Deformable op tests: zero-offset equivalence with standard convs, oracle checks,
and the DCN detector path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from relation_tpu.ops.deform import deformable_conv, deformable_psroi_pool


def test_deformable_conv_zero_offset_equals_conv(rng):
    H, W, C, Co = 10, 12, 8, 6
    x = rng.randn(H, W, C).astype(np.float32)
    w = rng.randn(3, 3, C, Co).astype(np.float32) * 0.1
    off = np.zeros((H, W, 4 * 2 * 9), np.float32)
    got = np.asarray(deformable_conv(jnp.asarray(x), jnp.asarray(off),
                                     jnp.asarray(w), dilation=2, num_groups=4))
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x)[None], jnp.asarray(w), (1, 1), ((2, 2), (2, 2)),
        rhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=1e-4)


def test_deformable_conv_integer_offset_shifts(rng):
    # offset (dy=0, dx=1) for all taps/groups == sampling input shifted left by 1
    H, W, C = 8, 8, 4
    x = rng.randn(H, W, C).astype(np.float32)
    w = rng.randn(3, 3, C, C).astype(np.float32) * 0.1
    off = np.zeros((H, W, 2 * 2 * 9), np.float32)
    off[:, :, 1::2] = 1.0          # dx = 1 for every tap of both groups
    got = np.asarray(deformable_conv(jnp.asarray(x), jnp.asarray(off),
                                     jnp.asarray(w), dilation=1, num_groups=2))
    x_shift = np.zeros_like(x)
    x_shift[:, :-1] = x[:, 1:]
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x_shift)[None], jnp.asarray(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    # interior columns must match exactly; border columns differ (zero pad vs shift)
    np.testing.assert_allclose(got[:, 1:-2], np.asarray(want)[:, 1:-2],
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mode", ["scatter", "hat"])
def test_deformable_conv_custom_vjp_matches_autodiff(rng, monkeypatch, mode):
    # the production backward is a hand-written VJP (matmul dw/dcol + corner-
    # recompute doffset; dx per mode: autodiff-of-gather scatter or hat-row
    # matmuls); pin both against plain autodiff through the bilinear gathers
    from relation_tpu.ops import deform
    monkeypatch.setattr(deform, "_DCONV_VJP_MODE", mode)

    H, W, C, Co, G = 9, 11, 8, 6, 2
    x = rng.randn(H, W, C).astype(np.float32)
    w = (rng.randn(3, 3, C, Co) * 0.1).astype(np.float32)
    # non-integer offsets, some samples pushed out of bounds
    off = (rng.randn(H, W, G * 2 * 9) * 2.0 + 0.3).astype(np.float32)
    off[0, 0] = 50.0                     # fully outside -> zero grads there
    dout = rng.randn(H, W, Co).astype(np.float32)

    def loss_custom(x_, o_, w_):
        return jnp.sum(deform._dconv_core(3, 1, 2, 2, G, x_, o_, w_) * dout)

    def loss_auto(x_, o_, w_):
        out, _ = deform._dconv_fwd(3, 1, 2, 2, G, x_, o_, w_)
        return jnp.sum(out * dout)

    gc = jax.grad(loss_custom, argnums=(0, 1, 2))(
        jnp.asarray(x), jnp.asarray(off), jnp.asarray(w))
    ga = jax.grad(loss_auto, argnums=(0, 1, 2))(
        jnp.asarray(x), jnp.asarray(off), jnp.asarray(w))
    for got, want, name in zip(gc, ga, ["dx", "doffset", "dw"]):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


@pytest.mark.parametrize("mode", ["scatter", "hat"])
def test_deformable_conv_custom_vjp_under_vmap(rng, monkeypatch, mode):
    # the DCN trainer hits this op as jit(vmap(grad(.))) — cover that shape
    from relation_tpu.ops import deform
    monkeypatch.setattr(deform, "_DCONV_VJP_MODE", mode)

    B, H, W, C = 2, 6, 7, 4
    x = rng.randn(B, H, W, C).astype(np.float32)
    w = (rng.randn(3, 3, C, C) * 0.1).astype(np.float32)
    off = (rng.randn(B, H, W, 2 * 2 * 9) * 1.5 + 0.25).astype(np.float32)

    def per_image(x_, o_):
        return jnp.sum(deform._dconv_core(3, 1, 1, 1, 2, x_, o_,
                                          jnp.asarray(w)) ** 2)

    def per_image_auto(x_, o_):
        out, _ = deform._dconv_fwd(3, 1, 1, 1, 2, x_, o_, jnp.asarray(w))
        return jnp.sum(out ** 2)

    f = jax.jit(jax.grad(lambda xs, os: jnp.sum(jax.vmap(per_image)(xs, os)),
                         argnums=(0, 1)))
    fa = jax.jit(jax.grad(
        lambda xs, os: jnp.sum(jax.vmap(per_image_auto)(xs, os)),
        argnums=(0, 1)))
    gc = f(jnp.asarray(x), jnp.asarray(off))
    ga = fa(jnp.asarray(x), jnp.asarray(off))
    for got, want, name in zip(gc, ga, ["dx", "doffset"]):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def np_dpsroi_oracle(feat, rois, trans, scale, P=7, S=4, trans_std=0.1):
    """Direct port of the CUDA kernel semantics for group_size=1."""
    H, W, C = feat.shape
    R = len(rois)
    out = np.zeros((R, P, P, C), np.float32)
    for n in range(R):
        sw = round(rois[n, 0]) * scale - 0.5
        sh = round(rois[n, 1]) * scale - 0.5
        ew = (round(rois[n, 2]) + 1.0) * scale - 0.5
        eh = (round(rois[n, 3]) + 1.0) * scale - 0.5
        rw = max(ew - sw, 0.1)
        rh = max(eh - sh, 0.1)
        bw, bh = rw / P, rh / P
        sbw, sbh = bw / S, bh / S
        for ph in range(P):
            for pw in range(P):
                tx = trans[n, 0, ph, pw] * trans_std if trans is not None else 0.0
                ty = trans[n, 1, ph, pw] * trans_std if trans is not None else 0.0
                ws = pw * bw + sw + tx * rw
                hs = ph * bh + sh + ty * rh
                acc = np.zeros(C)
                cnt = 0
                for ih in range(S):
                    for iw in range(S):
                        w = ws + iw * sbw
                        h = hs + ih * sbh
                        if w < -0.5 or w > W - 0.5 or h < -0.5 or h > H - 0.5:
                            continue
                        w = min(max(w, 0.0), W - 1.0)
                        h = min(max(h, 0.0), H - 1.0)
                        h0, w0 = int(np.floor(h)), int(np.floor(w))
                        h1, w1 = min(h0 + 1, H - 1), min(w0 + 1, W - 1)
                        lh, lw = h - h0, w - w0
                        v = (feat[h0, w0] * (1 - lh) * (1 - lw)
                             + feat[h0, w1] * (1 - lh) * lw
                             + feat[h1, w0] * lh * (1 - lw)
                             + feat[h1, w1] * lh * lw)
                        acc += v
                        cnt += 1
                out[n, ph, pw] = acc / cnt if cnt else 0.0
    return out


def test_deformable_psroi_matches_oracle(rng):
    H, W, C, R = 12, 16, 5, 6
    feat = rng.randn(H, W, C).astype(np.float32)
    x1 = rng.uniform(0, 150, R)
    y1 = rng.uniform(0, 100, R)
    rois = np.stack([x1, y1, x1 + rng.uniform(20, 90, R),
                     y1 + rng.uniform(20, 70, R)], 1).astype(np.float32)
    trans = (rng.randn(R, 2, 7, 7) * 0.5).astype(np.float32)
    scale = 1.0 / 16

    got0 = np.asarray(deformable_psroi_pool(jnp.asarray(feat), jnp.asarray(rois),
                                            None, scale))
    want0 = np_dpsroi_oracle(feat, rois, None, scale)
    np.testing.assert_allclose(got0, want0, rtol=1e-4, atol=1e-4)

    got = np.asarray(deformable_psroi_pool(jnp.asarray(feat), jnp.asarray(rois),
                                           jnp.asarray(trans), scale))
    want = np_dpsroi_oracle(feat, rois, trans, scale)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert np.abs(got - got0).max() > 1e-4   # trans actually moved samples


def test_psroi_group_channels(rng):
    # group_size=3, output_dim=2: channel (ctop*3+gh)*3+gw feeds bin (ph,pw)
    H, W = 9, 9
    G, outdim, P = 3, 2, 3
    feat = np.zeros((H, W, outdim * G * G), np.float32)
    for c in range(outdim * G * G):
        feat[:, :, c] = c   # constant planes -> output identifies channel choice
    rois = np.asarray([[0, 0, 143, 143]], np.float32)   # covers whole 9x9 map
    got = np.asarray(deformable_psroi_pool(
        jnp.asarray(feat), jnp.asarray(rois), None, 1.0 / 16, pooled_size=P,
        group_size=G, sample_per_part=2, output_dim=outdim))
    for ph in range(P):
        for pw in range(P):
            gh = min(max(int(ph * G / P), 0), G - 1)
            gw = min(max(int(pw * G / P), 0), G - 1)
            for ctop in range(outdim):
                assert got[0, ph, pw, ctop] == (ctop * G + gh) * G + gw


def test_dcn_detector_forward(rng):
    from relation_tpu.models.detector import RelationRCNN
    model = RelationRCNN(num_classes=5, num_anchors=3, backbone="tiny",
                         head_dim=32, use_relation=False, use_learn_nms=False,
                         dcn=True, conv_dtype=jnp.float32)
    img = jnp.asarray(rng.randn(64, 64, 3).astype(np.float32))
    rois = jnp.asarray(np.stack([np.zeros(6), np.zeros(6), np.full(6, 20.0),
                                 np.full(6, 20.0)], 1).astype(np.float32))
    im_info = jnp.asarray([64.0, 64.0, 1.0])
    params = model.init(jax.random.PRNGKey(0), img, rois, im_info, 6)
    out = model.apply(params, img, rois, im_info, 6)
    assert out["cls_score"].shape == (6, 5)
    assert "offset" in params["params"]


def test_dcn_bottleneck_batched_per_image(rng):
    """At B>1 each image must get ITS OWN deformable branch (regression for a
    [0]-slice that broadcast image 0's branch across the batch)."""
    from relation_tpu.models.backbone import DCNBottleneck
    block = DCNBottleneck(prefix="5a", mid=8, out=16, dilation=2,
                          deform_groups=4, has_proj=True, dtype=jnp.float32)
    x = jnp.asarray(rng.randn(2, 6, 6, 16).astype(np.float32))
    params = block.init(jax.random.PRNGKey(0), x)
    out_b = block.apply(params, x)
    out_0 = block.apply(params, x[0:1])
    out_1 = block.apply(params, x[1:2])
    np.testing.assert_allclose(np.asarray(out_b[0]), np.asarray(out_0[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_b[1]), np.asarray(out_1[0]),
                               rtol=1e-5, atol=1e-5)
    # the two images genuinely differ (the bug made them share a branch)
    assert np.abs(np.asarray(out_b[0]) - np.asarray(out_b[1])).max() > 1e-3


@pytest.mark.parametrize("mode", ["scatter", "autodiff"])
def test_deformable_conv_batched_matches_vmap(rng, monkeypatch, mode):
    """deformable_conv_batched (flat row gathers/scatters — the train-path
    form; a vmap of the per-image op lowers to TPU batched gather/scatter,
    measured r5 at 17.5 ms/img res5 backward) must match vmap(per-image)
    exactly: forward AND all three grads, with out-of-bounds samples."""
    from relation_tpu.ops import deform
    monkeypatch.setattr(deform, "_DCONV_VJP_MODE", mode)

    B, H, W, C, Co, G = 3, 7, 9, 8, 6, 2
    x = rng.randn(B, H, W, C).astype(np.float32)
    w = (rng.randn(3, 3, C, Co) * 0.1).astype(np.float32)
    off = (rng.randn(B, H, W, G * 2 * 9) * 2.0 + 0.3).astype(np.float32)
    off[0, 0, 0] = 50.0                  # fully outside -> zero grads there
    dout = rng.randn(B, H, W, Co).astype(np.float32)

    def loss_batched(x_, o_, w_):
        out = deform.deformable_conv_batched(x_, o_, w_, kernel=3, dilation=2,
                                             num_groups=G)
        return jnp.sum(out * dout)

    def loss_vmap(x_, o_, w_):
        out = jax.vmap(lambda xi, oi: deform.deformable_conv(
            xi, oi, w_, kernel=3, dilation=2, num_groups=G))(x_, o_)
        return jnp.sum(out * dout)

    args = (jnp.asarray(x), jnp.asarray(off), jnp.asarray(w))
    np.testing.assert_allclose(
        np.asarray(jax.jit(loss_batched)(*args)),
        np.asarray(jax.jit(loss_vmap)(*args)), rtol=2e-5,
        err_msg="forward")
    gb = jax.jit(jax.grad(loss_batched, argnums=(0, 1, 2)))(*args)
    gv = jax.jit(jax.grad(loss_vmap, argnums=(0, 1, 2)))(*args)
    for got, want, name in zip(gb, gv, ["dx", "doffset", "dw"]):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_dconv_col2im_kernel_matches_scatter(rng, monkeypatch):
    """The fused Pallas col2im (dx of the batched deformable-conv backward,
    interpret mode on CPU) must match the scatter-transpose dx exactly —
    same hat-row weights, f32 accumulation."""
    from relation_tpu.ops import deform
    from relation_tpu.ops.pallas.dconv_col2im import (dconv_col2im,
                                                      hat_rows_masked)

    B, H, W, C, G = 2, 6, 7, 8, 2
    kk, cg = 9, C // G
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    off = jnp.asarray((rng.randn(B, H, W, G * 2 * 9) * 2.0 + 0.3)
                      .astype(np.float32))
    dcol = jnp.asarray(rng.randn(B, H, W, kk, C).astype(np.float32))

    yy, xx = jax.vmap(lambda o: deform._dconv_tap_coords(o, 3, 1, 1, 1, G))(off)
    # scatter reference: pull dcol through the flat col gather
    _, pull = jax.vjp(lambda xv: deform._dconv_col_flat(xv, yy, xx, G), x)
    dx_ref = np.asarray(pull(dcol)[0])

    inside = (yy > -1.0) & (yy < H) & (xx > -1.0) & (xx < W)
    yz = jnp.where(inside, yy, 0.0)
    xz = jnp.where(inside, xx, 0.0)
    Q = H * W
    Rr = kk * Q

    def bg_rows(c):
        return c.reshape(B, kk, G, Q).transpose(0, 2, 1, 3).reshape(B * G, Rr)

    by = hat_rows_masked(bg_rows(yz), bg_rows(inside), H, jnp.float32)
    bx = hat_rows_masked(bg_rows(xz), bg_rows(inside), W, jnp.float32)
    d_rows = (dcol.reshape(B, H, W, kk, G, cg).transpose(0, 4, 3, 1, 2, 5)
              .reshape(B * G, Rr, cg))
    pad_r = (-Rr) % 256
    by = jnp.pad(by, ((0, 0), (0, pad_r), (0, 0)))
    bx = jnp.pad(bx, ((0, 0), (0, pad_r), (0, 0)))
    d_rows = jnp.pad(d_rows, ((0, 0), (0, pad_r), (0, 0)))
    out = dconv_col2im(by, bx, d_rows, H, W, interpret=True)
    dx_k = np.asarray(out.reshape(B, G, H, W, cg).transpose(0, 2, 3, 1, 4)
                      .reshape(B, H, W, C))
    np.testing.assert_allclose(dx_k, dx_ref, rtol=2e-5, atol=2e-5)
