"""ResNet-101 backbone, TPU-native (NHWC, bfloat16 matmuls, frozen BatchNorm).

Capability-parity with the reference's hand-unrolled MXNet symbol
(reference: relation_rcnn/symbols/resnet_v1_101_rcnn_base.py:29-683):

- conv1 7x7/2 -> bn -> relu -> 3x3/2 maxpool
- res2 (3 units, 256), res3 (4 units, 512, /2), res4 (23 units, 1024, /2)
  => stride-16 ``conv4`` feature that feeds the RPN
- res5 (3 units, 2048): stride 1, 3x3 convs dilated 2 (rcnn_base.py:621-683),
  so the RCNN feature also has stride 16.
- every BatchNorm runs with frozen statistics (use_global_stats=True,
  rcnn_base.py BatchNorm calls; eps=1e-5 per ``self.eps``) and frozen gamma/beta
  (FIXED_PARAMS always includes gamma/beta) — i.e. a constant per-channel affine.

Module/parameter names mirror the Caffe-style reference names (res4b22_branch2c,
bn4b22_branch2c, ...) so converted reference checkpoints map 1:1.

Stride placement follows the Caffe variant the reference uses: the stride-2 sits on
the first 1x1 (branch2a) and on the branch1 projection (rcnn_base.py res3a/res4a).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn


class FrozenBatchNorm(nn.Module):
    """BatchNorm with frozen statistics and frozen affine — a constant per-channel
    scale/shift, matching use_global_stats=True inference-mode BN.

    ``channel_axis`` selects the channel dimension (-1 for NHWC, 1 for the planar
    NCHW stem path); the parameter shapes are identical either way."""
    eps: float = 1e-5
    channel_axis: int = -1

    @nn.compact
    def __call__(self, x, channels: int | None = None):
        """Apply to ``x``; or, with ``x=None`` and ``channels`` given, return
        the folded per-channel (scale, bias) for use inside a fused kernel.
        The parameters are identical either way."""
        c = x.shape[self.channel_axis] if x is not None else int(channels)
        gamma = self.param("gamma", nn.initializers.ones, (c,))
        beta = self.param("beta", nn.initializers.zeros, (c,))
        mean = self.param("moving_mean", nn.initializers.zeros, (c,))
        var = self.param("moving_var", nn.initializers.ones, (c,))
        scale = gamma / jnp.sqrt(var + self.eps)
        bias = beta - mean * scale
        if x is None:
            return scale, bias
        shape = [1] * x.ndim
        shape[self.channel_axis] = c
        return (x * scale.astype(x.dtype).reshape(shape)
                + bias.astype(x.dtype).reshape(shape))


def _conv(name, features, kernel, strides=1, dilation=1, dtype=jnp.bfloat16):
    pad = ((kernel - 1) // 2) * dilation
    return nn.Conv(features=features, kernel_size=(kernel, kernel),
                   strides=(strides, strides),
                   padding=((pad, pad), (pad, pad)),
                   kernel_dilation=(dilation, dilation),
                   use_bias=False, dtype=dtype, param_dtype=jnp.float32,
                   name=name)


def _fold_tower(k2a, k2b, k2c, bn2a, bn2b, bn2c, dtype, min_mid=0):
    """BN-fold one branch2 tower -> (wa, b1, w3, b2, wc, b3) with w3 in
    tap-major rows (the shifted-matmul order of the Pallas kernels). The ONE
    copy of the fold formula — used by Bottleneck(fold=True) and the
    checkpoint-time fold_trunk_params/fold_res4_params.

    ``min_mid``: zero-pad Cmid up to this (the 128-lane tile) — the MXU
    processes 128 lanes regardless, Mosaic's sliced weight DMAs require
    lane-tile alignment, and zero channels provably contribute nothing
    (relu(0+0)=0 through every stage)."""
    (sa, ba), (sb, bb), (sc, bc) = bn2a, bn2b, bn2c
    mid = k2b.shape[-1]
    pad = max(0, min_mid - mid)
    wa = jnp.pad(k2a[0, 0] * sa[None, :], ((0, 0), (0, pad)))
    w3 = jnp.pad(k2b * sb[None, None, None, :],
                 ((0, 0), (0, 0), (0, pad), (0, pad)))
    wc = jnp.pad(k2c[0, 0] * sc[None, :], ((0, pad), (0, 0)))
    m = mid + pad
    return (wa.astype(dtype), jnp.pad(ba, (0, pad)),
            w3.reshape(9 * m, m).astype(dtype), jnp.pad(bb, (0, pad)),
            wc.astype(dtype), bc)


class Bottleneck(nn.Module):
    """One Caffe-style bottleneck unit: 1x1 (stride) -> 3x3 (dilate) -> 1x1, with an
    optional branch1 projection."""
    prefix: str          # e.g. "4b22" -> convs res4b22_branch*, bns bn4b22_branch*
    mid: int
    out: int
    stride: int = 1
    dilation: int = 1
    has_proj: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, fold: bool = False):
        p = self.prefix
        if fold:
            # Return BN-folded weights for the fused res4 stack kernel instead
            # of applying the block. Parameter paths are identical to the plain
            # path (res*_branch2x/kernel via _ConvKernel == nn.Conv's layout).
            assert not self.has_proj and self.stride == 1 and self.dilation == 1
            C, mid, dt = x.shape[-1], self.mid, self.dtype
            k2a = _ConvKernel((1, 1, C, mid), name=f"res{p}_branch2a")()
            sa, ba = FrozenBatchNorm(name=f"bn{p}_branch2a")(None, channels=mid)
            k2b = _ConvKernel((3, 3, mid, mid), name=f"res{p}_branch2b")()
            sb, bb = FrozenBatchNorm(name=f"bn{p}_branch2b")(None, channels=mid)
            k2c = _ConvKernel((1, 1, mid, self.out), name=f"res{p}_branch2c")()
            sc, bc = FrozenBatchNorm(name=f"bn{p}_branch2c")(None,
                                                             channels=self.out)
            return _fold_tower(k2a, k2b, k2c, (sa, ba), (sb, bb), (sc, bc), dt)
        if self.has_proj:
            sc = _conv(f"res{p}_branch1", self.out, 1, self.stride, dtype=self.dtype)(x)
            sc = FrozenBatchNorm(name=f"bn{p}_branch1")(sc)
        else:
            sc = x
        y = _conv(f"res{p}_branch2a", self.mid, 1, self.stride, dtype=self.dtype)(x)
        y = nn.relu(FrozenBatchNorm(name=f"bn{p}_branch2a")(y))
        y = _conv(f"res{p}_branch2b", self.mid, 3, 1, self.dilation, dtype=self.dtype)(y)
        y = nn.relu(FrozenBatchNorm(name=f"bn{p}_branch2b")(y))
        y = _conv(f"res{p}_branch2c", self.out, 1, dtype=self.dtype)(y)
        y = FrozenBatchNorm(name=f"bn{p}_branch2c")(y)
        return nn.relu(sc + y)


class _ConvKernel(nn.Module):
    """Holds a conv kernel param (path <name>/kernel, HWIO, lecun-normal init —
    identical to nn.Conv's) without applying the convolution, so a fused kernel
    path shares parameters with the plain conv path."""
    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape)


class _Conv1Weights(nn.Module):
    """Holds the conv1 kernel under the standard path (conv1/kernel) so the
    space-to-depth stem shares parameters with the plain 7x7 stem."""

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (7, 7, 3, 64))


def conv1_w4(w7: jnp.ndarray) -> jnp.ndarray:
    """Re-index the [7, 7, C, 64] conv1 kernel for the space-to-depth stem:
    -> [16*4C, 64]. Output row h of the stride-2 conv reads input rows
    2h+i-3 = 2(h+di-2)+pi with original tap i = 2*di + pi - 1 (i = -1 is zero
    padding), so the 7x7 taps scatter into 4x4 taps (di, dj) over phase-major
    s2d channels (pi, pj, c)."""
    C = w7.shape[2]
    w8 = jnp.pad(w7, ((1, 0), (1, 0), (0, 0), (0, 0)))
    return (w8.reshape(4, 2, 4, 2, C, 64)
            .transpose(0, 2, 1, 3, 4, 5)          # (di, dj, pi, pj, c, o)
            .reshape(16 * 4 * C, 64))


def image_to_s2d_planar(img_hwc):
    """Host-side space-to-depth: [H, W, C] -> [4C, H/2, W/2], channel order
    (pi, pj, c). TPU-first input layout: a [H, W, 3] image is lane-padded
    3->128 on device (~42x HBM waste, ~1 ms to touch at 608x1024); the s2d
    planar form is dense. Works on numpy or jax arrays; H, W must be even."""
    H, W, C = img_hwc.shape
    return (img_hwc.reshape(H // 2, 2, W // 2, 2, C)
            .transpose(1, 3, 4, 0, 2)
            .reshape(4 * C, H // 2, W // 2))


def _unit_names(stage: int, n: int) -> Sequence[str]:
    """Caffe ResNet-101 unit naming: res2 a,b,c; res3 a,b1..b3; res4 a,b1..b22;
    res5 a,b,c (matches reference symbol names)."""
    if stage in (2, 5):
        return [f"{stage}{s}" for s in "abc"[:n]]
    return [f"{stage}a"] + [f"{stage}b{i}" for i in range(1, n)]


class ResNet101C4(nn.Module):
    """conv1 .. res4b22 — the stride-16 shared trunk feeding RPN + heads.

    Mirrors get_resnet_v1_conv4 (rcnn_base.py:29-619). Returns features for the
    requested stages; stage 4 is the default output.

    Accepts the image in either layout (dispatch is static on input shape):

    - s2d planar ``[B, 12, H/2, W/2]`` (``image_to_s2d_planar``) — the TPU-fast
      path: a [H, W, 3] image is lane-padded 3->128 on device, so merely
      reading it costs ~1 ms at 608x1024; in s2d planar form the stem (conv1 as
      16-tap im2col + one MXU matmul, bn, relu, pool) runs in ~0.4 ms instead
      of ~1.9 ms (tools/microbench_stem.py).
    - NHWC ``[B, H, W, 3]`` — legacy path: channels zero-padded to 8 before
      the 7x7/2 conv (bit-identical math, halves XLA's 3-channel conv cost).

    The stored parameter is the reference-shaped [7, 7, 3, 64] ``conv1`` in
    both paths.
    """
    dtype: Any = jnp.bfloat16
    out_stages: Sequence[int] = (4,)
    # res4b1..b22 fused Pallas stack: None = use it when precomputed folded
    # weights are passed in (``res4_folded``), True forces the in-graph fold
    # (interpret mode on CPU — tests), False disables.
    fuse_res4: bool | None = None
    # stop_gradient boundary after this stage (0 = none). The reference binds
    # FIXED_PARAMS with grad_req='null' (core/module.py:753-773), which skips
    # their backward kernels entirely; zeroing grads only in the optimizer
    # mask still pays dgrad+wgrad through conv1+res2 — the most
    # bandwidth-expensive (stride-4/8) stages. Numerics are identical: those
    # grads were already masked to zero. No-op in forward-only graphs.
    freeze_through: int = 0

    @nn.compact
    def __call__(self, x, res4_folded=None, trunk_folded=None):
        import jax
        w7 = _Conv1Weights(name="conv1")()          # param path conv1/kernel
        if x.ndim == 4 and x.shape[1] == 12:
            B, K, Ho, Wo = x.shape
            bn = FrozenBatchNorm(name="bn_conv1", channel_axis=1)
            use_kernel = (jax.default_backend() != "cpu"
                          and Ho % 16 == 0 and Wo % 128 == 0 and B == 1)
            if use_kernel:
                # fused Pallas stem: im2col patches assembled in VMEM,
                # one MXU matmul, bn+relu in the epilogue
                from relation_tpu.ops.pallas.stem import stem_conv1_bn_relu
                w4 = conv1_w4(w7)
                scale, bias = bn(None, channels=64)
                out = stem_conv1_bn_relu(x[0], w4, scale, bias)[None]
                out = out.astype(self.dtype)
            else:
                # XLA path: 16 contiguous tap slices + one [192, 64] matmul
                w4 = conv1_w4(w7).astype(self.dtype)
                sp = jnp.pad(x.astype(self.dtype),
                             ((0, 0), (0, 0), (2, 1), (2, 1)))
                taps = jnp.concatenate(
                    [sp[:, :, dh:dh + Ho, dw:dw + Wo]
                     for dh in range(4) for dw in range(4)], axis=1)
                patches = taps.reshape(B, 16 * K, Ho * Wo)
                out = jnp.einsum("ko,bkn->bon", w4, patches,
                                 preferred_element_type=self.dtype)
                out = out.reshape(B, 64, Ho, Wo)
                out = nn.relu(bn(out))
            out = jax.lax.reduce_window(
                out, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
                ((0, 0), (0, 0), (1, 1), (1, 1)))
            x = out.transpose(0, 2, 3, 1)           # NHWC [B, H/4, W/4, 64]
        else:
            xp = jnp.pad(x.astype(self.dtype), ((0, 0), (0, 0), (0, 0), (0, 5)))
            w7p = jnp.pad(w7, ((0, 0), (0, 0), (0, 5), (0, 0))).astype(self.dtype)
            x = jax.lax.conv_general_dilated(
                xp, w7p, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=self.dtype)
            x = nn.relu(FrozenBatchNorm(name="bn_conv1")(x))
            # MXNet pool1: 3x3/2, pad 1 -> ceil-mode padding via explicit pad
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = {}
        plan = {2: (3, 64, 256, 1), 3: (4, 128, 512, 2), 4: (23, 256, 1024, 2)}
        if trunk_folded is not None and (x.shape[1] % 4 or x.shape[2] % 4):
            # stage-2/3 stride-2 decimation needs even dims at every stage;
            # conv ceil-mode semantics differ for odd dims — use the conv path
            trunk_folded = None
        if trunk_folded is not None and x.shape[0] == 1:
            # ALL-Pallas trunk: every res2..res4 block is a kernel, so no XLA
            # conv sits upstream of a pallas call (which would forfeit its
            # space-to-batch rewrites — see ops/pallas/bottleneck_proj.py).
            from relation_tpu.ops.pallas.res4 import fused_bottleneck_stack
            from relation_tpu.ops.pallas.bottleneck_proj import (
                fused_proj_bottleneck)
            y = x[0].astype(self.dtype)
            for stage, (n, mid, out, stride) in plan.items():
                f = trunk_folded[stage]
                y = fused_proj_bottleneck(y, *f["proj"], stride=stride)
                if f["stack"] is not None:
                    y = fused_bottleneck_stack(y, *f["stack"])
                outs[stage] = y[None]
            if self.out_stages == (4,):
                return outs[4]
            return {s: outs[s] for s in self.out_stages}
        for stage, (n, mid, out, stride) in plan.items():
            names = _unit_names(stage, n)
            fuse = (stage == 4 and x.shape[0] == 1
                    and self.fuse_res4 is not False
                    and (self.fuse_res4 is True or res4_folded is not None))
            if fuse:
                from relation_tpu.ops.pallas.res4 import fused_bottleneck_stack
                x = Bottleneck(prefix=names[0], mid=mid, out=out, stride=stride,
                               has_proj=True, dtype=self.dtype)(x)
                if res4_folded is not None:
                    # weights were BN-folded once outside the per-image jit
                    # (fold_res4_params); the 22 blocks' raw params go unused
                    x = fused_bottleneck_stack(
                        x[0].astype(self.dtype), *res4_folded)[None]
                else:
                    x = self._fused_identity_stack(x, names[1:], mid, out)
            else:
                for i, name in enumerate(names):
                    x = Bottleneck(prefix=name, mid=mid, out=out,
                                   stride=stride if i == 0 else 1,
                                   has_proj=(i == 0), dtype=self.dtype)(x)
            if stage <= self.freeze_through:
                x = jax.lax.stop_gradient(x)
            outs[stage] = x
        if self.out_stages == (4,):
            return x
        return {s: outs[s] for s in self.out_stages}

    def _fused_identity_stack(self, x, names, mid, out):
        """Run a run of identity bottlenecks (res4b1..b22) through the
        VMEM-resident Pallas stack kernel (ops/pallas/res4.py), folding each
        frozen BN into its conv weights. Each block is still a Bottleneck child
        module called with fold=True, so the parameter tree (Bottleneck_N auto
        scopes included) is identical to the plain path and checkpoints are
        interchangeable."""
        from relation_tpu.ops.pallas.res4 import fused_bottleneck_stack
        folded = [Bottleneck(prefix=p, mid=mid, out=out,
                             dtype=self.dtype)(x, fold=True) for p in names]
        wa, b1, w3, b2, wc, b3 = (jnp.stack(t) for t in zip(*folded))
        y = fused_bottleneck_stack(x[0].astype(self.dtype),
                                   wa, b1, w3, b2, wc, b3)
        return y[None]


def fold_res4_params(c4_params, dtype=jnp.bfloat16, eps: float = 1e-5):
    """Precompute the BN-folded weight stacks for the fused res4 Pallas kernel
    (the res4-only subset of ``fold_trunk_params``; run once per checkpoint,
    outside the per-image jit — folding ~25M params in the graph costs
    ~1 ms/call). Returns the (wa, b1, w3, b2, wc, b3) stacks accepted by
    ``fused_bottleneck_stack``. Under jit the unused stage-2/3 folds are DCE'd.
    """
    return fold_trunk_params(c4_params, dtype, eps)[4]["stack"]


def fold_trunk_params(c4_params, dtype=jnp.bfloat16, eps: float = 1e-5):
    """Precompute BN-folded weights for the ALL-Pallas trunk (res2a..res4b22):
    per stage a projection-block weight tuple (ops/pallas/bottleneck_proj.py)
    plus the identity-stack arrays (ops/pallas/res4.py). Run once per
    checkpoint, outside the per-image jit.

    Returns {stage: {"proj": (w1, b1p, wa, b1, w3, b2, wc, b3),
                     "stack": (wa, b1, w3, b2, wc, b3) stacked, or None}}.
    """
    import re
    units: dict[int, dict[str, Any]] = {2: {}, 3: {}, 4: {}}
    for sub in c4_params.values():
        if not hasattr(sub, "keys"):
            continue
        for k in sub.keys():
            m = re.fullmatch(r"res(\d)(\w*?)_branch2a", k)
            if m:
                units[int(m.group(1))][m.group(2)] = sub
                break

    def bn(sub, name):
        p = sub[name]
        scale = p["gamma"] / jnp.sqrt(p["moving_var"] + eps)
        return scale, p["beta"] - p["moving_mean"] * scale

    def fold3(sub, prefix, min_mid=128):
        """Fold one block's branch2 tower (Cmid padded to the 128-lane tile
        for the Mosaic sliced weight DMAs — see _fold_tower)."""
        return _fold_tower(sub[f"res{prefix}_branch2a"]["kernel"],
                           sub[f"res{prefix}_branch2b"]["kernel"],
                           sub[f"res{prefix}_branch2c"]["kernel"],
                           bn(sub, f"bn{prefix}_branch2a"),
                           bn(sub, f"bn{prefix}_branch2b"),
                           bn(sub, f"bn{prefix}_branch2c"), dtype, min_mid)

    def unit_order(name):
        # identity units are "b"/"c" (res2) or "b1".."b22" (res3/res4)
        return "bc".index(name) if name in ("b", "c") else int(name[1:]) - 1

    out = {}
    for stage, subs in units.items():
        prefix_a = f"{stage}a"
        sub_a = subs["a"]
        s1, b1bn = bn(sub_a, f"bn{prefix_a}_branch1")
        k1 = sub_a[f"res{prefix_a}_branch1"]["kernel"]
        wa, b1, w3, b2, wc, b3 = fold3(sub_a, prefix_a)
        proj = ((k1[0, 0] * s1[None, :]).astype(dtype), b1bn,
                wa, b1, w3, b2, wc, b3)
        idents = sorted((n for n in subs if n != "a"), key=unit_order)
        stacked = None
        if idents:
            folded = [fold3(subs[n], f"{stage}{n}") for n in idents]
            stacked = tuple(jnp.stack(t) for t in zip(*folded))
        out[stage] = {"proj": proj, "stack": stacked}
    return out


class ResNet101C5(nn.Module):
    """res5a..res5c, dilated (stride 1, dilation 2) — mirrors get_resnet_v1_conv5
    (rcnn_base.py:621-683)."""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for i, name in enumerate(_unit_names(5, 3)):
            x = Bottleneck(prefix=name, mid=512, out=2048, stride=1, dilation=2,
                           has_proj=(i == 0), dtype=self.dtype)(x)
        return x


class DCNBottleneck(nn.Module):
    """Bottleneck whose 3x3 is a deformable convolution with a learned offset
    field (num_deformable_group=4, offsets init to zero).

    Mirrors the DCN res5 units (reference resnet_v1_101_rcnn_dcn.py:690-755):
    res5x_branch2b_offset = 3x3 conv (72ch = 4 groups * 2 * 9 taps, dilate 2)
    res5x_branch2b        = DeformableConvolution(dilate 2, 4 groups).
    """
    prefix: str
    mid: int
    out: int
    dilation: int = 2
    deform_groups: int = 4
    has_proj: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        from relation_tpu.ops.deform import deformable_conv
        p = self.prefix
        if self.has_proj:
            sc = _conv(f"res{p}_branch1", self.out, 1, 1, dtype=self.dtype)(x)
            sc = FrozenBatchNorm(name=f"bn{p}_branch1")(sc)
        else:
            sc = x
        y = _conv(f"res{p}_branch2a", self.mid, 1, 1, dtype=self.dtype)(x)
        y = nn.relu(FrozenBatchNorm(name=f"bn{p}_branch2a")(y))

        off_ch = self.deform_groups * 2 * 9
        offset = nn.Conv(off_ch, (3, 3), padding=((2, 2), (2, 2)),
                         kernel_dilation=(self.dilation, self.dilation),
                         kernel_init=nn.initializers.zeros,
                         dtype=jnp.float32, param_dtype=jnp.float32,
                         name=f"res{p}_branch2b_offset")(y.astype(jnp.float32))
        w = self.param(f"res{p}_branch2b_weight",
                       nn.initializers.variance_scaling(2.0, "fan_out",
                                                        "truncated_normal"),
                       (3, 3, self.mid, self.mid))
        # gathers + GEMM ride the same bf16 policy as every other backbone
        # conv (offsets stay f32); accumulation is f32 inside deformable_conv
        def dconv(yy, oo):
            return deformable_conv(yy.astype(self.dtype), oo,
                                   w.astype(self.dtype), kernel=3,
                                   dilation=self.dilation,
                                   num_groups=self.deform_groups)
        if y.ndim == 4:
            # natively-batched op (flat row gathers/scatters): a vmap over the
            # per-image op lowers to XLA *batched* gather/scatter, which the
            # TPU executes catastrophically slowly — measured r5: res5
            # backward 17.5 ms/img flat in B via vmap vs flat-indexed form
            # (ops/deform.py::deformable_conv_batched block comment)
            from relation_tpu.ops.deform import deformable_conv_batched
            d = deformable_conv_batched(
                y.astype(self.dtype), offset, w.astype(self.dtype), kernel=3,
                dilation=self.dilation, num_groups=self.deform_groups)
        else:
            d = dconv(y, offset)
        y = d.astype(self.dtype)
        y = nn.relu(FrozenBatchNorm(name=f"bn{p}_branch2b")(y))
        y = _conv(f"res{p}_branch2c", self.out, 1, dtype=self.dtype)(y)
        y = FrozenBatchNorm(name=f"bn{p}_branch2c")(y)
        return nn.relu(sc + y)


class ResNet101C5DCN(nn.Module):
    """Deformable res5 (reference resnet_v1_101_rcnn_dcn.py:688-755)."""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for i, name in enumerate(_unit_names(5, 3)):
            x = DCNBottleneck(prefix=name, mid=512, out=2048, dilation=2,
                              has_proj=(i == 0), dtype=self.dtype)(x)
        return x
