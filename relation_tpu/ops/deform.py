"""Deformable ops: deformable convolution and (deformable) PSROI pooling.

TPU-native equivalents of the reference's CUDA kernels:
- deformable_im2col bilinear-gather + GEMM   (operator_cxx/nn/deformable_im2col.cuh:216)
- DeformablePSROIPoolForwardKernel           (operator_cxx/deformable_psroi_pooling.cu:52-145)
- PSROIPoolForwardKernel                     (operator_cxx/psroi_pooling.cu:82-99)

Design: the sampling grid is data-dependent but the *shape* is static, so each op is
a fixed set of bilinear gathers (XLA lowers to coalesced HBM gathers) followed by an
MXU contraction. Autodiff gives the col2im/backward kernels for free (gather's
transpose is scatter-add, exactly what deformable_col2im does).

Semantics notes kept bit-faithful to the CUDA:
- deformable conv samples with ZERO padding outside the map (im2col guard
  `h_im > -1 && h_im < height`, bilinear with zero extension)
- deformable PSROI pooling rounds ROI coords, shifts by -0.5, skips samples
  outside (-0.5, dim-0.5) and divides by the count of in-range samples
- offset channel layout: [group, 2*(kh*kw)] with (dy, dx) interleaved per tap
  (deformable_im2col.cuh data_offset_ptr indexing)
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from relation_tpu.ops.nms import _on_tpu

# Backward-mode selector, read at trace time (A/B via
# RELATION_TPU_DEFORM_VJP, or monkeypatch + jax.clear_caches() in one
# process):
#   "scatter"  — custom VJP: dw/dcol as MXU matmuls, doffset by recomputing
#                the 4 corner gathers, dx by autodiff of the col gather
#                (lowers to scatter-adds, but only for the dx term).
#   "hat"      — custom VJP with dx as a dense hat-row^T matmul per group.
#                Scatter-free, but materializes A=[kk*Q, H*W] — measured
#                3x SLOWER than "scatter" at res5 scale (38x64 map, B=4:
#                res5 backward 20.3 vs 6.3 ms/img), kept for small maps.
#   "autodiff" — no custom VJP at all (~144 scatter-adds per conv).
#   "kernel"   — batched path only: dx via the fused Pallas col2im matmul
#                (ops/pallas/dconv_col2im.py) on TPU, falling back to
#                "scatter" off-TPU / per-image. Default: the scatter dx
#                measured 17.5-20.2 ms/img for the res5 backward (r5 legs —
#                XLA serializes TPU scatter-adds); the kernel streams the
#                same contraction through the MXU.
# RELATION_TPU_DEFORM_AUTODIFF=1 is the legacy spelling of "autodiff".
_DCONV_VJP_MODE = os.environ.get("RELATION_TPU_DEFORM_VJP", "kernel")
if os.environ.get("RELATION_TPU_DEFORM_AUTODIFF", "0") == "1":
    _DCONV_VJP_MODE = "autodiff"
if _DCONV_VJP_MODE not in ("kernel", "scatter", "hat", "autodiff"):
    raise ValueError(
        f"RELATION_TPU_DEFORM_VJP={_DCONV_VJP_MODE!r}: expected one of "
        "'kernel', 'scatter', 'hat', 'autodiff'")


def _bilinear_zero_pad(feat: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray):
    """Bilinear sample of feat [H, W, C] at float (y, x) with zero outside.
    y, x: [...]; returns [..., C]. Matches im2col_bilinear + the -1 < coord < dim
    guard of deformable_im2col.cuh."""
    H, W, C = feat.shape
    inside = (y > -1.0) & (y < H) & (x > -1.0) & (x < W)
    y = jnp.where(inside, y, 0.0)
    x = jnp.where(inside, x, 0.0)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    flat = feat.reshape(H * W, C)

    def corner(yy, xx):
        ok = (yy >= 0) & (yy <= H - 1) & (xx >= 0) & (xx <= W - 1)
        yi = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
        xi = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
        v = flat[(yi * W + xi).reshape(-1)].reshape(yy.shape + (C,))
        return v * ok[..., None]

    # interpolation weights follow the feature dtype (bf16 on the TPU conv
    # policy, f32 when the caller passes f32 — the oracle-tested path)
    ly = (y - y0).astype(feat.dtype)
    lx = (x - x0).astype(feat.dtype)
    v00 = corner(y0, x0)
    v01 = corner(y0, x0 + 1)
    v10 = corner(y0 + 1, x0)
    v11 = corner(y0 + 1, x0 + 1)
    out = (v00 * ((1 - ly) * (1 - lx))[..., None]
           + v01 * ((1 - ly) * lx)[..., None]
           + v10 * (ly * (1 - lx))[..., None]
           + v11 * (ly * lx)[..., None])
    return out * inside[..., None]


def _dconv_tap_coords(offset, k, stride, dilation, pad, num_groups):
    """Sample coordinates for every tap/group: (yy, xx) each
    [k*k, G, Ho, Wo] float32. Shared by the forward and the custom VJP."""
    Ho, Wo = offset.shape[0], offset.shape[1]
    base_y = (jnp.arange(Ho, dtype=jnp.float32) * stride - pad)[:, None]
    base_x = (jnp.arange(Wo, dtype=jnp.float32) * stride - pad)[None, :]
    off = offset.reshape(Ho, Wo, num_groups, k * k, 2).astype(jnp.float32)
    tap_y = jnp.arange(k, dtype=jnp.float32).repeat(k) * dilation  # [k*k]
    tap_x = jnp.tile(jnp.arange(k, dtype=jnp.float32), k) * dilation
    # [kk, G, Ho, Wo]
    dy = jnp.moveaxis(off[..., 0], (2, 3), (1, 0))
    dx = jnp.moveaxis(off[..., 1], (2, 3), (1, 0))
    yy = base_y[None, None] + tap_y[:, None, None, None] + dy
    xx = base_x[None, None] + tap_x[:, None, None, None] + dx
    return yy, xx


def _dconv_col(x, yy, xx, num_groups):
    """deformable_im2col: bilinear-gather the column tensor.
    x: [H, W, C]; yy/xx: [kk, G, Ho, Wo] -> col [Ho, Wo, kk, C]."""
    H, W, C = x.shape
    kk = yy.shape[0]
    cg = C // num_groups
    cols = []
    for t in range(kk):
        parts = []
        for g in range(num_groups):
            parts.append(_bilinear_zero_pad(
                x[:, :, g * cg:(g + 1) * cg], yy[t, g], xx[t, g]))
        cols.append(jnp.concatenate(parts, axis=-1))           # [Ho, Wo, C]
    return jnp.stack(cols, axis=2)                             # [Ho, Wo, kk, C]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _dconv_core(kernel, stride, dilation, pad, num_groups, x, offset, weights):
    out, _ = _dconv_fwd(kernel, stride, dilation, pad, num_groups,
                        x, offset, weights)
    return out


def _dconv_fwd(kernel, stride, dilation, pad, num_groups, x, offset, weights):
    k = kernel
    yy, xx = _dconv_tap_coords(offset, k, stride, dilation, pad, num_groups)
    col = _dconv_col(x, yy, xx, num_groups)                    # [Ho, Wo, kk, C]
    wmat = weights.reshape(k * k, x.shape[-1], -1)
    out = jnp.einsum("hwkc,kco->hwo", col, wmat,
                     preferred_element_type=jnp.float32)
    return out, (x, offset, weights, col)


def _hat_rows(coords, valid, dim, dtype):
    """Comparison-form bilinear interpolation rows: [..., dim] with
    row[..., p] = max(1 - |coord - p|, 0) * valid. Equivalent to the two
    corner weights of _bilinear_zero_pad (zero-extension included), but
    expressed densely so its transpose is a matmul, not a scatter."""
    g = jnp.arange(dim, dtype=jnp.float32)
    w = jnp.maximum(1.0 - jnp.abs(coords[..., None] - g), 0.0)
    return (w * valid[..., None]).astype(dtype)


def _dconv_bwd(kernel, stride, dilation, pad, num_groups, res, dout):
    """Backward with a mode-dependent dx path: weight/col grads are always
    matmuls and the offset grad always recomputes the 4 corner gathers; the
    image grad dx is, per _DCONV_VJP_MODE, either autodiff of the col gather
    (default 'scatter' — lowers to 4-corner scatter-adds, which beat the
    dense form at res5 scale) or a hat-row^T matmul per group ('hat' —
    deformable_col2im as a dense MXU contraction, kept for small maps).

    Mirrors deformable_col2im / deformable_col2im_coord
    (operator_cxx/nn/deformable_im2col.cuh:310-470) which are atomic-add
    scatter kernels on CUDA — on TPU the same contraction rides the MXU.
    """
    x, offset, weights, col = res
    H, W, C = x.shape
    k = kernel
    kk = k * k
    G = num_groups
    cg = C // G
    Ho, Wo = offset.shape[0], offset.shape[1]
    Q = Ho * Wo
    wmat = weights.reshape(kk, C, -1)

    # d col and d weights: plain MXU contractions
    dcol = jnp.einsum("hwo,kco->hwkc", dout, wmat,
                      preferred_element_type=jnp.float32).astype(col.dtype)
    dw = jnp.einsum("hwkc,hwo->kco", col, dout,
                    preferred_element_type=jnp.float32)
    dw = dw.reshape(weights.shape).astype(weights.dtype)

    yy, xx = _dconv_tap_coords(offset, k, stride, dilation, pad, G)
    inside = (yy > -1.0) & (yy < H) & (xx > -1.0) & (xx < W)
    yz = jnp.where(inside, yy, 0.0)
    xz = jnp.where(inside, xx, 0.0)

    # dcol regrouped per (tap, group): [kk, G, Q, cg]
    dcol_tg = jnp.moveaxis(dcol.reshape(Q, kk, G, cg), (1, 2), (0, 1))

    if _DCONV_VJP_MODE in ("scatter", "kernel"):
        # ---- d x: transpose of the col gather (XLA scatter-adds). The
        # dense hat-row alternative below materializes A=[kk*Q, H*W]
        # (~200 MB/group at res5 scale) and measured 3x slower in the DCN
        # train step; the 4-corner sparsity only scatter exploits.
        # ("kernel" applies to the batched op; per-image falls back here.)
        _, pull = jax.vjp(lambda xv: _dconv_col(xv, yy, xx, G), x)
        dx = pull(dcol)[0].astype(x.dtype)
    else:
        # ---- d x: hat-row contraction per group (all taps in one dot) ----
        mdt = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
        By = _hat_rows(yz.reshape(kk, G, Q), inside.reshape(kk, G, Q), H, mdt)
        Bx = _hat_rows(xz.reshape(kk, G, Q), inside.reshape(kk, G, Q), W, mdt)
        dx_parts = []
        for g in range(G):
            # A[kq, hw] = By[kq, h] * Bx[kq, w]  (the bilinear weight of
            # output sample kq on input pixel hw); dXg = A^T @ dcol_g
            A = (By[:, g, :, :, None] * Bx[:, g, :, None, :]).reshape(kk * Q,
                                                                      H * W)
            dxg = jax.lax.dot_general(
                A, dcol_tg[:, g].reshape(kk * Q, cg).astype(mdt),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)             # [H*W, cg]
            dx_parts.append(dxg)
        dx = jnp.concatenate(dx_parts, axis=-1).reshape(H, W, C).astype(x.dtype)

    # ---- d offset: recompute the 4 corner values (gathers are cheap) ----
    y0 = jnp.floor(yz)
    x0 = jnp.floor(xz)
    ly = (yz - y0).astype(x.dtype)
    lx = (xz - x0).astype(x.dtype)
    dys, dxs = [], []
    for t in range(kk):
        dyg, dxg_ = [], []
        for g in range(G):
            feat = x[:, :, g * cg:(g + 1) * cg]
            flat = feat.reshape(H * W, cg)

            def corner(yy_, xx_):
                ok = (yy_ >= 0) & (yy_ <= H - 1) & (xx_ >= 0) & (xx_ <= W - 1)
                yi = jnp.clip(yy_, 0, H - 1).astype(jnp.int32)
                xi = jnp.clip(xx_, 0, W - 1).astype(jnp.int32)
                v = flat[(yi * W + xi).reshape(-1)].reshape(yy_.shape + (cg,))
                return v * ok[..., None]

            v00 = corner(y0[t, g], x0[t, g])
            v01 = corner(y0[t, g], x0[t, g] + 1)
            v10 = corner(y0[t, g] + 1, x0[t, g])
            v11 = corner(y0[t, g] + 1, x0[t, g] + 1)
            d = dcol_tg[t, g].reshape(Ho, Wo, cg).astype(jnp.float32)
            m = inside[t, g].astype(jnp.float32)
            gy = ((v10 - v00) * (1 - lx[t, g])[..., None]
                  + (v11 - v01) * lx[t, g][..., None]).astype(jnp.float32)
            gx = ((v01 - v00) * (1 - ly[t, g])[..., None]
                  + (v11 - v10) * ly[t, g][..., None]).astype(jnp.float32)
            dyg.append(jnp.sum(d * gy, axis=-1) * m)
            dxg_.append(jnp.sum(d * gx, axis=-1) * m)
        dys.append(jnp.stack(dyg))
        dxs.append(jnp.stack(dxg_))
    ddy = jnp.stack(dys)                                        # [kk, G, Ho, Wo]
    ddx = jnp.stack(dxs)
    doff = jnp.stack([ddy, ddx], axis=-1)                       # [kk, G, Ho, Wo, 2]
    doff = jnp.moveaxis(doff, (0, 1), (3, 2))                   # [Ho, Wo, G, kk, 2]
    doff = doff.reshape(offset.shape).astype(offset.dtype)
    return dx, doff, dw


_dconv_core.defvjp(_dconv_fwd, _dconv_bwd)


# ---------------------------------------------------------------------------
# natively-BATCHED deformable conv
#
# The train step evaluates the trunk batched; a jax.vmap over the per-image op
# turns every bilinear gather into an XLA *batched* gather and its transpose
# into a *batched* scatter, which TPU lowers catastrophically (measured r5:
# DCN res5 backward 17.5-18.5 ms/img FLAT in B; the whole-train forward's
# deform stage 9.4 ms/img vs ~3 ms for the same math un-vmapped at inference).
# Here every corner access of every (batch, tap, group) is ONE flat row-gather
# from [B*H*W*G, cg] (row = ((b*H + y)*W + x)*G + g), so the backward dx is 4
# flat row scatter-adds — the layout the TPU gather/scatter path is fast for.
# ---------------------------------------------------------------------------

def _dconv_col_flat(x, yy, xx, num_groups):
    """Batched deformable_im2col as 4 flat row-gathers.

    x: [B, H, W, C]; yy/xx: [B, kk, G, Ho, Wo] absolute sample coords.
    Returns col [B, Ho, Wo, kk, C] (zero outside the map, like
    _bilinear_zero_pad)."""
    B, H, W, C = x.shape
    kk, G = yy.shape[1], yy.shape[2]
    cg = C // G
    xr = x.reshape(B * H * W * G, cg)        # row r = ((b*H+y)*W+x)*G + g

    inside = (yy > -1.0) & (yy < H) & (xx > -1.0) & (xx < W)
    yz = jnp.where(inside, yy, 0.0)
    xz = jnp.where(inside, xx, 0.0)
    y0 = jnp.floor(yz)
    x0 = jnp.floor(xz)
    ly = (yz - y0).astype(x.dtype)
    lx = (xz - x0).astype(x.dtype)

    b_idx = jnp.arange(B, dtype=jnp.int32)[:, None, None, None, None]
    g_idx = jnp.arange(G, dtype=jnp.int32)[None, None, :, None, None]

    def corner(yc, xc):
        ok = (yc >= 0) & (yc <= H - 1) & (xc >= 0) & (xc <= W - 1)
        yi = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
        xi = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
        r = ((b_idx * H + yi) * W + xi) * G + g_idx
        v = xr[r.reshape(-1)].reshape(r.shape + (cg,))
        return v * ok[..., None]

    v00 = corner(y0, x0)
    v01 = corner(y0, x0 + 1)
    v10 = corner(y0 + 1, x0)
    v11 = corner(y0 + 1, x0 + 1)
    col = (v00 * ((1 - ly) * (1 - lx))[..., None]
           + v01 * ((1 - ly) * lx)[..., None]
           + v10 * (ly * (1 - lx))[..., None]
           + v11 * (ly * lx)[..., None]) * inside[..., None]
    # [B, kk, G, Ho, Wo, cg] -> [B, Ho, Wo, kk, G*cg]
    Ho, Wo = yy.shape[3], yy.shape[4]
    return col.transpose(0, 3, 4, 1, 2, 5).reshape(B, Ho, Wo, kk, C)


def _dconv_fwd_b(kernel, stride, dilation, pad, num_groups, x, offset, weights):
    k = kernel
    yy, xx = jax.vmap(
        lambda o: _dconv_tap_coords(o, k, stride, dilation, pad, num_groups)
    )(offset)                                  # coordinate math is elementwise
    col = _dconv_col_flat(x, yy, xx, num_groups)     # [B, Ho, Wo, kk, C]
    wmat = weights.reshape(k * k, x.shape[-1], -1)
    out = jnp.einsum("bhwkc,kco->bhwo", col, wmat,
                     preferred_element_type=jnp.float32)
    return out, (x, offset, weights, col)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _dconv_core_b(kernel, stride, dilation, pad, num_groups, x, offset, weights):
    out, _ = _dconv_fwd_b(kernel, stride, dilation, pad, num_groups,
                          x, offset, weights)
    return out


def _dconv_bwd_b(kernel, stride, dilation, pad, num_groups, res, dout):
    """Batched backward: dw/dcol as batched MXU matmuls, doffset by a
    vectorized 4-corner recompute (4 flat gathers total), dx per
    _DCONV_VJP_MODE: the fused Pallas col2im matmul kernel on TPU
    ('kernel', default) or the transpose of the flat col gather
    (flat row scatter-adds).

    Mirrors deformable_col2im / col2im_coord
    (operator_cxx/nn/deformable_im2col.cuh:317-470)."""
    x, offset, weights, col = res
    B, H, W, C = x.shape
    k = kernel
    kk = k * k
    G = num_groups
    cg = C // G

    wmat = weights.reshape(kk, C, -1)
    dcol = jnp.einsum("bhwo,kco->bhwkc", dout, wmat,
                      preferred_element_type=jnp.float32).astype(col.dtype)
    dw = jnp.einsum("bhwkc,bhwo->kco", col, dout,
                    preferred_element_type=jnp.float32)
    dw = dw.reshape(weights.shape).astype(weights.dtype)

    yy, xx = jax.vmap(
        lambda o: _dconv_tap_coords(o, k, stride, dilation, pad, G))(offset)

    if _DCONV_VJP_MODE == "kernel" and _on_tpu():
        # ---- d x: fused Pallas col2im (Khatri-Rao matmul on the MXU;
        # the scatter form below serializes on TPU: 17.5-20.2 ms/img at
        # res5 scale, r5 legs) ----
        from relation_tpu.ops.pallas.dconv_col2im import (dconv_col2im,
                                                          hat_rows_masked)
        Ho, Wo = yy.shape[3], yy.shape[4]
        Q = Ho * Wo
        Rr = kk * Q
        inside_b = (yy > -1.0) & (yy < H) & (xx > -1.0) & (xx < W)
        yzb = jnp.where(inside_b, yy, 0.0)
        xzb = jnp.where(inside_b, xx, 0.0)

        def bg_rows(c):
            # [B, kk, G, Ho, Wo] -> (b, g)-major rows r = k*Q + q
            return (c.reshape(B, kk, G, Q).transpose(0, 2, 1, 3)
                    .reshape(B * G, Rr))

        mdt = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
        by = hat_rows_masked(bg_rows(yzb), bg_rows(inside_b), H, mdt)
        bx = hat_rows_masked(bg_rows(xzb), bg_rows(inside_b), W, mdt)
        d_rows = (dcol.reshape(B, Ho, Wo, kk, G, cg)
                  .transpose(0, 4, 3, 1, 2, 5)
                  .reshape(B * G, Rr, cg).astype(mdt))
        pad_r = (-Rr) % 256
        if pad_r:
            by = jnp.pad(by, ((0, 0), (0, pad_r), (0, 0)))
            bx = jnp.pad(bx, ((0, 0), (0, pad_r), (0, 0)))
            d_rows = jnp.pad(d_rows, ((0, 0), (0, pad_r), (0, 0)))
        out = dconv_col2im(by, bx, d_rows, H, W)       # [B*G, H*W, cg] f32
        dx = (out.reshape(B, G, H, W, cg).transpose(0, 2, 3, 1, 4)
              .reshape(B, H, W, C).astype(x.dtype))
    else:
        # ---- d x: transpose of the flat col gather (flat scatter-adds) ----
        _, pull = jax.vjp(lambda xv: _dconv_col_flat(xv, yy, xx, G), x)
        dx = pull(dcol)[0].astype(x.dtype)

    # ---- d offset: vectorized corner recompute (4 flat gathers) ----
    inside = (yy > -1.0) & (yy < H) & (xx > -1.0) & (xx < W)
    yz = jnp.where(inside, yy, 0.0)
    xz = jnp.where(inside, xx, 0.0)
    y0 = jnp.floor(yz)
    x0 = jnp.floor(xz)
    # corner values / interpolation factors ride the conv's compute dtype
    # (bf16 on the TPU policy — the [B, kk, G, Q, cg] corner tensors are
    # ~45M elements; f32 here doubled the recompute's HBM traffic), with the
    # final dot over cg accumulating in f32
    cdt = x.dtype
    ly = (yz - y0).astype(cdt)
    lx = (xz - x0).astype(cdt)
    xr = x.reshape(B * H * W * G, cg)
    b_idx = jnp.arange(B, dtype=jnp.int32)[:, None, None, None, None]
    g_idx = jnp.arange(G, dtype=jnp.int32)[None, None, :, None, None]

    def corner(yc, xc):
        ok = (yc >= 0) & (yc <= H - 1) & (xc >= 0) & (xc <= W - 1)
        yi = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
        xi = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
        r = ((b_idx * H + yi) * W + xi) * G + g_idx
        v = xr[r.reshape(-1)].reshape(r.shape + (cg,))
        return v * ok[..., None]

    v00 = corner(y0, x0)
    v01 = corner(y0, x0 + 1)
    v10 = corner(y0 + 1, x0)
    v11 = corner(y0 + 1, x0 + 1)
    # dcol regrouped to [B, kk, G, Ho, Wo, cg]
    Ho, Wo = yy.shape[3], yy.shape[4]
    d = (dcol.reshape(B, Ho, Wo, kk, G, cg)
         .transpose(0, 3, 4, 1, 2, 5).astype(cdt))
    gy = (v10 - v00) * (1 - lx)[..., None] + (v11 - v01) * lx[..., None]
    gx = (v01 - v00) * (1 - ly)[..., None] + (v11 - v10) * ly[..., None]
    m = inside.astype(jnp.float32)
    # dot over cg with f32 accumulation (bf16 products, f32 sum)
    ddy = jnp.sum((d * gy).astype(jnp.float32), axis=-1) * m
    ddx = jnp.sum((d * gx).astype(jnp.float32), axis=-1) * m
    doff = jnp.stack([ddy, ddx], axis=-1)               # [B, kk, G, Ho, Wo, 2]
    doff = jnp.moveaxis(doff, (1, 2), (3, 4))           # [B, Ho, Wo, kk, G, 2]
    # offset layout: [B, Ho, Wo, G, kk, 2] flattened (MXNet per-group taps)
    doff = doff.transpose(0, 1, 2, 4, 3, 5).reshape(offset.shape)
    doff = doff.astype(offset.dtype)
    return dx, doff, dw


_dconv_core_b.defvjp(_dconv_fwd_b, _dconv_bwd_b)


@functools.partial(jax.jit, static_argnames=("kernel", "stride", "dilation",
                                             "pad", "num_groups"))
def deformable_conv_batched(x: jnp.ndarray, offset: jnp.ndarray,
                            weights: jnp.ndarray, kernel: int = 3,
                            stride: int = 1, dilation: int = 1,
                            pad: int | None = None,
                            num_groups: int = 4) -> jnp.ndarray:
    """Batched deformable convolution: x [B, H, W, C], offset [B, Ho, Wo, ch].

    Numerically identical to vmap(deformable_conv) (parity-tested), but every
    gather/scatter is a flat 2D row operation — the form the TPU is fast for
    (see the block comment above). Always uses the flat custom VJP except
    under RELATION_TPU_DEFORM_VJP=autodiff."""
    k = kernel
    if pad is None:
        pad = ((k - 1) // 2) * dilation
    assert x.ndim == 4 and offset.ndim == 4
    assert x.shape[-1] % num_groups == 0
    if _DCONV_VJP_MODE != "autodiff":
        return _dconv_core_b(k, stride, dilation, pad, num_groups,
                             x, offset, weights)
    out, _ = _dconv_fwd_b(k, stride, dilation, pad, num_groups,
                          x, offset, weights)
    return out


@functools.partial(jax.jit, static_argnames=("kernel", "stride", "dilation",
                                             "pad", "num_groups"))
def deformable_conv(x: jnp.ndarray, offset: jnp.ndarray, weights: jnp.ndarray,
                    kernel: int = 3, stride: int = 1, dilation: int = 1,
                    pad: int | None = None, num_groups: int = 4) -> jnp.ndarray:
    """Deformable convolution, one image.

    x: [H, W, C]; offset: [Ho, Wo, num_groups * 2 * k * k] with per-group
    (dy, dx) per tap (MXNet layout); weights: [k, k, C, Cout].
    Returns [Ho, Wo, Cout]. Mirrors DeformableConvolutionOp::Forward
    (deformable_convolution-inl.h:78-130) = deformable_im2col + GEMM.

    The backward is a custom VJP (dw/dcol as matmuls, doffset by corner
    recompute, dx per _DCONV_VJP_MODE; see _dconv_bwd) unless
    RELATION_TPU_DEFORM_VJP=autodiff (or legacy ..._AUTODIFF=1).
    """
    H, W, C = x.shape
    k = kernel
    if pad is None:
        pad = ((k - 1) // 2) * dilation
    assert C % num_groups == 0
    if _DCONV_VJP_MODE != "autodiff":
        return _dconv_core(k, stride, dilation, pad, num_groups,
                           x, offset, weights)
    out, _ = _dconv_fwd(k, stride, dilation, pad, num_groups,
                        x, offset, weights)
    return out


@functools.partial(jax.jit, static_argnames=("pooled_size", "group_size",
                                             "sample_per_part", "output_dim",
                                             "part_size"))
def deformable_psroi_pool(feat: jnp.ndarray, rois: jnp.ndarray,
                          trans: jnp.ndarray | None, spatial_scale: float,
                          pooled_size: int = 7, group_size: int = 1,
                          sample_per_part: int = 4, trans_std: float = 0.1,
                          output_dim: int | None = None,
                          part_size: int | None = None) -> jnp.ndarray:
    """(Deformable) position-sensitive ROI pooling, one image.

    feat: [H, W, C]; rois: [R, 4]; trans: [R, 2, part, part] or None (no_trans,
    i.e. plain PSROI-average pooling with the same rounding/sampling scheme).
    Returns [R, P, P, output_dim].

    Bit-faithful to DeformablePSROIPoolForwardKernel
    (deformable_psroi_pooling.cu:52-145): rounded ROI coords, -0.5 shifts, 0.1
    min size, per-bin trans offset scaled by trans_std * roi size, average over
    in-range samples only (count normalization), position-sensitive channel
    c = (ctop*G + gh)*G + gw.
    """
    H, W, C = feat.shape
    P = pooled_size
    G = group_size
    S = sample_per_part
    output_dim = output_dim or C // (G * G)
    part_size = part_size or P
    R = rois.shape[0]

    start_w = jnp.round(rois[:, 0]) * spatial_scale - 0.5
    start_h = jnp.round(rois[:, 1]) * spatial_scale - 0.5
    end_w = (jnp.round(rois[:, 2]) + 1.0) * spatial_scale - 0.5
    end_h = (jnp.round(rois[:, 3]) + 1.0) * spatial_scale - 0.5
    roi_w = jnp.maximum(end_w - start_w, 0.1)
    roi_h = jnp.maximum(end_h - start_h, 0.1)
    bin_w = roi_w / P                                           # [R]
    bin_h = roi_h / P
    sub_w = bin_w / S
    sub_h = bin_h / S

    p = jnp.arange(P, dtype=jnp.float32)
    if trans is None:
        tx = jnp.zeros((R, P, P))
        ty = jnp.zeros((R, P, P))
    else:
        # part_h = floor(ph/P*part), class_id=0 (single class group in the heads)
        ph_part = jnp.floor(p / P * part_size).astype(jnp.int32)
        t = trans[:, :, ph_part][:, :, :, ph_part]              # [R, 2, P, P]
        tx = t[:, 0] * trans_std
        ty = t[:, 1] * trans_std

    # sample coords: [R, P(ph), P(pw), S(ih), S(iw)]
    s = jnp.arange(S, dtype=jnp.float32)
    wstart = (p[None, :] * bin_w[:, None])[:, None, :] + start_w[:, None, None] \
        + tx * roi_w[:, None, None]                             # [R, P, P]
    hstart = (p[None, :] * bin_h[:, None])[:, :, None] + start_h[:, None, None] \
        + ty * roi_h[:, None, None]
    xs = wstart[..., None, None] + (s[None, :] * sub_w[:, None])[:, None, None, None, :]
    ys = hstart[..., None, None] + (s[None, :] * sub_h[:, None])[:, None, None, :, None]
    full = (R, P, P, S, S)
    xs = jnp.broadcast_to(xs, full)
    ys = jnp.broadcast_to(ys, full)

    ok = (xs > -0.5) & (xs < W - 0.5) & (ys > -0.5) & (ys < H - 0.5)
    xc = jnp.clip(xs, 0.0, W - 1.0)
    yc = jnp.clip(ys, 0.0, H - 1.0)

    if G == 1:
        # Separable MXU formulation (zero gathers — the gather form costs
        # 8.4 ms at 300 ROIs on v5e, this ~0.5-1.3 ms). Per bin the S x S
        # sample grid factors per axis: x depends only on iw, y only on ih,
        # and the in-range mask is ok(ih, iw) = oky(ih) & okx(iw), so both
        # the masked sample sum AND the in-range count separate:
        #   sum  = (sum_ih oky*row(y)) @ feat @ (sum_iw okx*row(x))^T
        #   cnt  = cnt_y * cnt_x
        # row(.) is the bilinear hat against the integer grid — identical
        # weights to _bilinear_clamp_all's clamped corners.
        ys1 = ys[..., :, 0]                                     # [R,P,P,S] (ih)
        xs1 = xs[..., 0, :]                                     # [R,P,P,S] (iw)
        oky = (ys1 > -0.5) & (ys1 < H - 0.5)
        okx = (xs1 > -0.5) & (xs1 < W - 0.5)
        ycl = jnp.clip(ys1, 0.0, H - 1.0)
        xcl = jnp.clip(xs1, 0.0, W - 1.0)

        def interp_rows(coords, okm, dim):
            g = jnp.arange(dim, dtype=jnp.float32)
            w = jnp.maximum(1.0 - jnp.abs(coords[..., None] - g), 0.0)
            return jnp.sum(w * okm[..., None], axis=-2)         # [R,P,P,dim]

        By = interp_rows(ycl, oky, H)                           # [R,P,P,H]
        Bx = interp_rows(xcl, okx, W)                           # [R,P,P,W]
        cnt = (jnp.sum(oky, -1) * jnp.sum(okx, -1)).astype(feat.dtype)

        dt = jnp.bfloat16 if feat.dtype == jnp.bfloat16 else jnp.float32
        fdt = feat.astype(dt)
        # contract the LARGER spatial axis first so the staged intermediate
        # carries the smaller one (the roi_align_mxu lesson: the res5 map is
        # 38x64, so w-first stages [., H, C] at 0.6x the [., W, C] traffic)
        w_first = W >= H
        if trans is None:
            # no per-bin shifts: By is constant along pw, Bx along ph —
            # one big matmul each way
            if w_first:
                a = jnp.einsum("rqw,hwc->rqhc", Bx[:, 0].astype(dt), fdt,
                               preferred_element_type=jnp.float32)  # [R,P,H,C]
                summed = jnp.einsum("rph,rqhc->rpqc", By[:, :, 0].astype(dt),
                                    a, preferred_element_type=jnp.float32)
            else:
                a = jnp.einsum("rph,hwc->rpwc", By[:, :, 0].astype(dt), fdt,
                               preferred_element_type=jnp.float32)  # [R,P,W,C]
                summed = jnp.einsum("rpwc,rpqw->rpqc", a, Bx.astype(dt),
                                    preferred_element_type=jnp.float32)
        else:
            # per-bin shifts: chunk over the bin row to bound the staged
            # intermediate at the no-trans size
            rows = []
            for ph in range(P):
                if w_first:
                    a = jnp.einsum("rqw,hwc->rqhc", Bx[:, ph].astype(dt), fdt,
                                   preferred_element_type=jnp.float32)
                    rows.append(jnp.einsum(
                        "rqhc,rqh->rqc", a, By[:, ph].astype(dt),
                        preferred_element_type=jnp.float32))
                else:
                    a = jnp.einsum("rqh,hwc->rqwc", By[:, ph].astype(dt), fdt,
                                   preferred_element_type=jnp.float32)
                    rows.append(jnp.einsum(
                        "rqwc,rqw->rqc", a, Bx[:, ph].astype(dt),
                        preferred_element_type=jnp.float32))
            summed = jnp.stack(rows, axis=1)                    # [R,P,P,C]
        summed = summed.astype(feat.dtype)
        out = jnp.where(cnt[..., None] > 0,
                        summed / jnp.maximum(cnt[..., None], 1), 0.0)
        return out[..., :output_dim]

    # group_size > 1: position-sensitive channel selection per bin
    fs = feat.reshape(H, W, output_dim, G, G)
    outs = jnp.zeros((R, P, P, output_dim), feat.dtype)
    for ph in range(P):
        gh = min(max(int(ph * G / P), 0), G - 1)
        for pw in range(P):
            gw = min(max(int(pw * G / P), 0), G - 1)
            sub = fs[:, :, :, gh, gw]                            # [H, W, outdim]
            v = _bilinear_clamp_all(sub, yc[:, ph, pw], xc[:, ph, pw])  # [R,S,S,outdim]
            o = ok[:, ph, pw]
            cnt = jnp.sum(o, axis=(1, 2)).astype(feat.dtype)
            summed = jnp.sum(v * o[..., None], axis=(1, 2))
            outs = outs.at[:, ph, pw].set(
                jnp.where(cnt[:, None] > 0, summed / jnp.maximum(cnt[:, None], 1),
                          0.0))
    return outs


def _bilinear_clamp_all(feat: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray):
    """Bilinear sample with clamped coords (caller pre-masks validity).
    feat: [H, W, C]; y, x: [...] -> [..., C]."""
    H, W, C = feat.shape
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1 = jnp.minimum(y0 + 1, H - 1.0)
    x1 = jnp.minimum(x0 + 1, W - 1.0)
    ly = y - y0
    lx = x - x0
    flat = feat.reshape(H * W, C)

    def take(yy, xx):
        idx = (yy.astype(jnp.int32) * W + xx.astype(jnp.int32)).reshape(-1)
        return flat[idx].reshape(yy.shape + (C,))

    return (take(y0, x0) * ((1 - ly) * (1 - lx))[..., None]
            + take(y0, x1) * ((1 - ly) * lx)[..., None]
            + take(y1, x0) * (ly * (1 - lx))[..., None]
            + take(y1, x1) * (ly * lx)[..., None])
