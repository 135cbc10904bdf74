"""FPN variants: multi-level backbone/neck, shared RPN over the pyramid, ROI level
dispatch, FPN detection head (+relation, +learned NMS).

Reference: symbols/resnet_v1_101_rcnn_fpn*.py —
- neck: lateral 1x1 (256ch) on res2c/res3b3/res4b22/res5c, nearest x2 top-down
  sums, 3x3 smooth convs, extra stride-64 level from ft32_1x1 (fpn.py:799-835)
- RPN head weights shared across levels (init_weight_rpn has one set, :991-1001)
- ROI dispatch: feat_id = clip(floor(2 + log2(sqrt(w*h)/224)), 0, 3) mapping ROIs
  to strides (4, 8, 16, 32) (core/rcnn.py:55,156)
- head: per-level 7x7 ROI pooling -> roi_pool_fc1/roi_pool_fc2 (1024) (fpn.py:879-894)

TPU-native difference: instead of splitting ROIs into 4 ragged per-level streams
(reference ROIDispatch, core/rcnn.py:114-223), every ROI is pooled at all 4 levels
and the result selected by its feat_id — static shapes, one gather instead of four
ragged pipelines (SURVEY §7.9).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from relation_tpu.models.backbone import ResNet101C4, Bottleneck, _unit_names
from relation_tpu.models.rpn import RPNHead
from relation_tpu.models.relation import RelationModule
from relation_tpu.models.learn_nms import LearnNMSHead
from relation_tpu.ops.anchors import generate_anchors, shift_anchors
from relation_tpu.ops.boxes import bbox_pred, clip_boxes
from relation_tpu.ops.embeddings import extract_position_matrix_t
from relation_tpu.ops.nms import nms_topk_presorted
from relation_tpu.ops.roi_pool import roi_align_mxu, roi_pool

_norm_init = nn.initializers.normal(0.01)

FPN_STRIDES = (64, 32, 16, 8, 4)          # P6..P2, reference output order
DISPATCH_STRIDES = (4, 8, 16, 32)          # rois_0..rois_3


class ResNet101C5Standard(nn.Module):
    """res5 with stride 2, no dilation (the FPN trunk keeps the standard
    downsampling so res5c sits at stride 32)."""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for i, name in enumerate(_unit_names(5, 3)):
            x = Bottleneck(prefix=name, mid=512, out=2048,
                           stride=2 if i == 0 else 1, dilation=1,
                           has_proj=(i == 0), dtype=self.dtype)(x)
        return x


class FPNNeck(nn.Module):
    """Lateral + top-down + smooth + extra ft64 level (fpn.py:799-835).
    __call__({2,3,4,5}: feats) -> {stride: feat} for strides 64,32,16,8,4."""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats):
        def conv(name, k, s=1):
            pad = (k - 1) // 2
            return nn.Conv(256, (k, k), strides=(s, s),
                           padding=((pad, pad), (pad, pad)), dtype=self.dtype,
                           param_dtype=jnp.float32, kernel_init=_norm_init,
                           name=name)

        ft32 = conv("fpn_ft32_1x1", 1)(feats[5])
        ft16 = conv("fpn_ft16_1x1", 1)(feats[4])
        ft8 = conv("fpn_ft8_1x1", 1)(feats[3])
        ft4 = conv("fpn_ft4_1x1", 1)(feats[2])

        def up2(x):
            # nearest x2 (mx.symbol.UpSampling sample_type='nearest')
            b, h, w, c = x.shape
            return jnp.broadcast_to(x[:, :, None, :, None, :],
                                    (b, h, 2, w, 2, c)).reshape(b, 2 * h, 2 * w, c)

        ft16p = up2(ft32) + ft16
        ft8p = up2(ft16p) + ft8
        ft4p = up2(ft8p) + ft4

        out = {
            64: conv("fpn_ft64_3x3", 3, 2)(ft32),
            32: conv("fpn_ft32_3x3", 3)(ft32),
            16: conv("fpn_ft16_3x3", 3)(ft16p),
            8: conv("fpn_ft8_3x3", 3)(ft8p),
            4: conv("fpn_ft4_3x3", 3)(ft4p),
        }
        return out


def roi_level_dispatch(rois: jnp.ndarray) -> jnp.ndarray:
    """feat_id in {0,1,2,3} -> strides (4, 8, 16, 32).
    Mirrors core/rcnn.py:55: clip(floor(2 + log2(sqrt(w*h)/224)), 0, 3)."""
    w = rois[:, 2] - rois[:, 0] + 1.0
    h = rois[:, 3] - rois[:, 1] + 1.0
    s = jnp.sqrt(jnp.maximum(w * h, 1e-6))
    fid = jnp.floor(2.0 + jnp.log2(s / 224.0))
    return jnp.clip(fid, 0, 3).astype(jnp.int32)


class RelationRCNNFPN(nn.Module):
    """FPN detector with optional relation modules and learned NMS."""
    num_classes: int = 81
    num_anchors: int = 12
    class_agnostic: bool = True
    use_relation: bool = True
    use_learn_nms: bool = True
    first_n: int = 100
    num_thresh: int = 5
    bbox_means: tuple | None = None
    bbox_stds: tuple | None = None
    roi_method: str = "align"
    conv_dtype: Any = jnp.bfloat16
    backbone: str = "resnet101"
    head_dim: int = 1024
    # compute dtype for the ROI-head FCs and relation attention (see detector.py)
    head_dtype: Any = jnp.float32
    # sinusoid dtype for the XLA geometric-bias path — the FPN learned-NMS
    # tail is HBM-bound on the f32 [C, 64, N, N] sinusoid (see geom_bias)
    geom_emb_dtype: Any = None
    # False: all head attention pure-XLA. Historical default — a Pallas call
    # consuming conv-derived tensors was measured to forfeit the pyramid's
    # stride-4/8 space-to-batch conv rewrites (round-1 note: +5.6 ms). Kept as
    # a switch for in-context A/B (tools/microbench_fpn.py).
    allow_pallas: bool = False
    # Pallas for the LEARNED-NMS head only (geometry-bias kernel at
    # [C, first_n, first_n] — small, VMEM-safe) while the head relation
    # modules stay XLA (their [N, nongt] pair tiles VMEM-OOM the kernel at
    # FPN head shapes, measured r5). None = follow allow_pallas.
    allow_pallas_lnms: bool | None = None
    # XLA learned-NMS attention: active-class gather cap (cfg.TPU.NMS_COMPACT_CLASSES)
    compact_classes: int = 32
    # stop_gradient after this trunk stage (FIXED_PARAMS grad_req='null'
    # analogue, reference core/module.py:753-773; see ResNet101C4)
    freeze_through: int = 0

    def setup(self):
        if self.backbone == "resnet101":
            self.c4 = ResNet101C4(dtype=self.conv_dtype, out_stages=(2, 3, 4),
                                  freeze_through=self.freeze_through)
            self.c5 = ResNet101C5Standard(dtype=self.conv_dtype)
        else:
            self.c4 = _TinyPyramid(dtype=self.conv_dtype)
            self.c5 = lambda x: nn.max_pool(x, (2, 2), strides=(2, 2))
        self.neck = FPNNeck(dtype=self.conv_dtype)
        self.rpn = RPNHead(num_anchors=self.num_anchors, dtype=self.conv_dtype)
        self.roi_pool_fc1 = nn.Dense(self.head_dim, name="roi_pool_fc1",
                                     dtype=self.head_dtype,
                                     param_dtype=jnp.float32,
                                     kernel_init=_norm_init)
        self.roi_pool_fc2 = nn.Dense(self.head_dim, name="roi_pool_fc2",
                                     dtype=self.head_dtype,
                                     param_dtype=jnp.float32,
                                     kernel_init=_norm_init)
        if self.use_relation:
            self.relation_1 = RelationModule(index=1, dim_qk=self.head_dim,
                                             dim_out=self.head_dim,
                                             dtype=self.head_dtype,
                                             allow_pallas=self.allow_pallas,
                                             geom_emb_dtype=self.geom_emb_dtype)
            self.relation_2 = RelationModule(index=2, dim_qk=self.head_dim,
                                             dim_out=self.head_dim,
                                             dtype=self.head_dtype,
                                             allow_pallas=self.allow_pallas,
                                             geom_emb_dtype=self.geom_emb_dtype)
        self.cls_score = nn.Dense(self.num_classes, name="cls_score",
                                  kernel_init=_norm_init)
        num_reg = 2 if self.class_agnostic else self.num_classes
        self.bbox_pred = nn.Dense(4 * num_reg, name="bbox_pred",
                                  kernel_init=_norm_init)
        if self.use_learn_nms:
            ap_lnms = (self.allow_pallas if self.allow_pallas_lnms is None
                       else self.allow_pallas_lnms)
            self.learn_nms_head = LearnNMSHead(
                num_fg_classes=self.num_classes - 1, first_n=self.first_n,
                num_thresh=self.num_thresh, class_agnostic=self.class_agnostic,
                bbox_means=self.bbox_means, bbox_stds=self.bbox_stds,
                attn_dtype=self.head_dtype, allow_pallas=ap_lnms,
                geom_emb_dtype=self.geom_emb_dtype,
                compact_classes=self.compact_classes)

    def features_and_rpn(self, image):
        """image [H, W, 3] -> ({stride: feat}, {stride: (rpn_cls, rpn_bbox)}).

        RPN outputs stay in RAW conv layout ([h, w, 2A] / [h, w, 4A], channel
        c = a*2+j resp. a*4+j): the [h, w, A, 2] unpack lane-pads 2 -> 128 on
        TPU, which at the stride-4 level alone is ~300 MB of padding traffic.
        ``.reshape(-1, 2)`` / ``.reshape(-1, 4)`` on the raw layout yields the
        SAME (h, w, a)-major row order as the unpacked form, so loss-side
        consumers are unchanged; the proposal decode slices channel planes from
        a [C, h, w] transpose instead (generate_proposals_fpn).

        A 4D input is an explicit batch and returns batch-leading outputs
        (see RelationRCNN.features_and_rpn — the trainer batches the trunk
        natively instead of vmapping it)."""
        batched = image.ndim == 4
        feats = self.c4(image if batched else image[None])  # {2,3,4} stages
        feats[5] = self.c5(feats[4])
        pyramid = self.neck(feats)
        rpn_out = {s: self.rpn(pyramid[s], raw=True) for s in FPN_STRIDES}
        if batched:
            return pyramid, rpn_out
        return ({s: f[0] for s, f in pyramid.items()},
                {s: (c[0], b[0]) for s, (c, b) in rpn_out.items()})

    def head(self, pyramid, rois, nongt_dim: int, pool_only: bool = False):
        """4-level pooled head with feat_id dispatch. ``pool_only`` returns
        the flattened selected pooled features early (benchmarking cut,
        tools/microbench_train_cuts.py stop_after='pool')."""
        fid = roi_level_dispatch(rois)
        pooled_levels = []
        for i, s in enumerate(DISPATCH_STRIDES):
            f = pyramid[s]
            if self.roi_method == "align":
                p = roi_align_mxu(f, rois, 1.0 / s, 7)
            else:
                p = roi_pool(f, rois, 1.0 / s, 7)
            pooled_levels.append(p)
        stacked = jnp.stack(pooled_levels, axis=0)        # [4, N, 7, 7, C]
        # one-hot select (NOT take_along_axis): the gather's backward is a
        # scatter into [4, N, 7, 7, C], which lowers to TPU batched-scatter
        # under the train step's vmap; the one-hot contraction is exact
        # (0/1 weights) with a dense elementwise backward
        fid_oh = jax.nn.one_hot(fid, len(DISPATCH_STRIDES),
                                dtype=stacked.dtype, axis=0)   # [4, N]
        sel = jnp.einsum("lnpqc,ln->npqc", stacked, fid_oh)
        flat = sel.reshape(sel.shape[0], -1).astype(jnp.float32)
        if pool_only:
            return flat

        if self.use_relation:
            pos_t = extract_position_matrix_t(rois, nongt_dim=nongt_dim)

        x = self.roi_pool_fc1(flat)
        if self.use_relation:
            x = x + self.relation_1(x, pos_t)
        x = nn.relu(x)
        x = self.roi_pool_fc2(x)
        if self.use_relation:
            x = x + self.relation_2(x, pos_t)
        fc2 = nn.relu(x)
        return self.cls_score(fc2), self.bbox_pred(fc2), fc2

    def learn_nms(self, cls_score, bbox_pred_arr, rois, roi_feat, im_info,
                  class_thresh: float = 0.0, probe: str = ""):
        return self.learn_nms_head(cls_score, bbox_pred_arr, rois, roi_feat,
                                   im_info, class_thresh=class_thresh,
                                   probe=probe)

    def __call__(self, image, rois, im_info, nongt_dim: int):
        pyramid, rpn_out = self.features_and_rpn(image)
        cls_s, bbox_p, fc2 = self.head(pyramid, rois, nongt_dim)
        out = {"cls_score": cls_s, "bbox_pred": bbox_p, "roi_feat": fc2,
               "rpn": rpn_out}
        if self.use_learn_nms:
            out.update(self.learn_nms(cls_s[:nongt_dim], bbox_p[:nongt_dim],
                                      rois[:nongt_dim], fc2[:nongt_dim], im_info))
        return out


class _TinyPyramid(nn.Module):
    """Toy multi-stage trunk for tests: stages 2/3/4 at strides 4/8/16."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if x.ndim == 4 and x.shape[1] == 12:
            # accept the s2d planar input layout (see _TinyTrunk, detector.py:
            # 200-206); undo it — this trunk only runs on CPU in tests/dryruns
            B, K, Ho, Wo = x.shape
            x = (x.reshape(B, 2, 2, 3, Ho, Wo)
                 .transpose(0, 4, 1, 5, 2, 3)
                 .reshape(B, 2 * Ho, 2 * Wo, 3))
        outs = {}
        for stage, reps in ((2, 2), (3, 1), (4, 1)):
            for r in range(reps):
                x = nn.relu(nn.Conv(16, (3, 3), strides=(2, 2), dtype=self.dtype,
                                    param_dtype=jnp.float32,
                                    name=f"t{stage}_{r}")(x))
            outs[stage] = x
        return outs


def fpn_anchors(feat_shapes: dict, scales, ratios):
    """Per-level anchor grids {stride: [K_s, 4]} (assign_pyramid_anchor
    enumeration, lib/rpn/rpn.py:246-300: base_size = stride at each level)."""
    out = {}
    for stride, (fh, fw) in feat_shapes.items():
        base = generate_anchors(stride, ratios, scales)
        out[stride] = shift_anchors(base, fh, fw, stride)
    return out


def generate_proposals_fpn(rpn_out: dict, anchors: dict, im_info,
                           pre_nms_top_n: int, post_nms_top_n: int,
                           nms_thresh: float, min_size: float,
                           use_kernel: bool | None = False,
                           topk: str = "exact"):
    """Joint over-pyramid proposal generation: decode every level, merge, one
    top-k + NMS (the static-shape analogue of the reference FPN proposal path).

    rpn_out: {stride: (rpn_cls [h,w,2A] raw conv layout, rpn_bbox [h,w,4A])}.
    Returns (rois [post_N, 4], scores [post_N], real [post_N]).
    """
    # TPU layout note (mirrors models/rpn.py::generate_proposals): the decode
    # runs on dense [N] coordinate VECTORS in (a, h, w) flatten order per
    # level — an [N, 4] box tensor over all ~155k pyramid anchors would be
    # lane-padded 4->128 (~80 MB), and the previous [h, w, A, {2,4}] unpack
    # of the RPN conv outputs lane-padded {2,4} -> 128 (~64x waste on the
    # stride-4 level). Channel planes are sliced from one [C, h, w]
    # transpose; anchor coordinates are broadcast [A, H, W] planes (constant
    # base anchors, never an [N, 4] grid).
    # MEASUREMENT TRAP: timing this with closed-over level outputs (jit
    # constants) reads ~3x slower — big padded constants are re-staged per
    # call. Decompose FPN stages only with traced-arg harnesses.
    sc, px1, py1, px2, py2 = [], [], [], [], []
    for stride, (cls, bbox) in rpn_out.items():
        H, W = cls.shape[0], cls.shape[1]
        A = cls.shape[2] // 2
        tc = cls.transpose(2, 0, 1).astype(jnp.float32)         # [2A, H, W]
        # 2-class softmax fg prob == sigmoid(fg_logit - bg_logit)
        fg = jax.nn.sigmoid((tc[1::2] - tc[0::2]).reshape(-1))  # (a, h, w)
        td = bbox.transpose(2, 0, 1).astype(jnp.float32)        # [4A, H, W]
        dx = td[0::4].reshape(-1)
        dy = td[1::4].reshape(-1)
        dw = td[2::4].reshape(-1)
        dh = td[3::4].reshape(-1)

        # anchor grid as dense [A, H, W] planes; anchors[stride] is the
        # (h, w, a)-ordered [K, 4] constant, whose first A rows are the cell
        # (0, 0) base anchors
        base = anchors[stride][:A]
        sx = jnp.arange(W, dtype=jnp.float32)[None, None, :] * stride
        sy = jnp.arange(H, dtype=jnp.float32)[None, :, None] * stride
        zero = jnp.zeros((A, H, W), jnp.float32)
        ax1 = (base[:, 0][:, None, None] + sx + zero).reshape(-1)
        ay1 = (base[:, 1][:, None, None] + sy + zero).reshape(-1)
        ax2 = (base[:, 2][:, None, None] + sx + zero).reshape(-1)
        ay2 = (base[:, 3][:, None, None] + sy + zero).reshape(-1)

        aw = ax2 - ax1 + 1.0
        ah = ay2 - ay1 + 1.0
        acx = ax1 + 0.5 * (aw - 1.0)
        acy = ay1 + 0.5 * (ah - 1.0)
        pcx = dx * aw + acx
        pcy = dy * ah + acy
        pw = jnp.exp(dw) * aw
        ph = jnp.exp(dh) * ah
        x1 = jnp.clip(pcx - 0.5 * (pw - 1.0), 0, im_info[1] - 1)
        y1 = jnp.clip(pcy - 0.5 * (ph - 1.0), 0, im_info[0] - 1)
        x2 = jnp.clip(pcx + 0.5 * (pw - 1.0), 0, im_info[1] - 1)
        y2 = jnp.clip(pcy + 0.5 * (ph - 1.0), 0, im_info[0] - 1)

        valid_h = jnp.floor(im_info[0] / stride).astype(jnp.int32)
        valid_w = jnp.floor(im_info[1] / stride).astype(jnp.int32)
        cell_ok = ((jnp.arange(H)[None, :, None] < valid_h) &
                   (jnp.arange(W)[None, None, :] < valid_w))
        cell_ok = jnp.broadcast_to(cell_ok, (A, H, W)).reshape(-1)
        ms = min_size * im_info[2]
        size_ok = ((x2 - x1 + 1.0) >= ms) & ((y2 - y1 + 1.0) >= ms)
        sc.append(jnp.where(cell_ok & size_ok, fg, -1e10))
        px1.append(x1)
        py1.append(y1)
        px2.append(x2)
        py2.append(y2)

    scores = jnp.concatenate(sc)
    k = min(pre_nms_top_n, scores.shape[0])
    if topk == "approx":
        # the pyramid has ~622k anchors at 608x1024 and XLA's exact TopK is a
        # full sort regardless of k (~920 us measured); approx_max_k's
        # PartialReduce + exact aggregation costs 385 us at recall 0.999
        # (expected ~6 of the 6000 pre-NMS candidates missed, all near the
        # rank-6000 boundary — immaterial after NMS to 300). The exact path
        # remains the default and the parity setting (cfg.TPU.FPN_TOPK).
        top_scores, top_idx = jax.lax.approx_max_k(
            scores, k, recall_target=0.999, aggregate_to_topk=True)
    else:
        top_scores, top_idx = jax.lax.top_k(scores, k)
    x1 = jnp.concatenate(px1)[top_idx]
    y1 = jnp.concatenate(py1)[top_idx]
    x2 = jnp.concatenate(px2)[top_idx]
    y2 = jnp.concatenate(py2)[top_idx]
    top_bT = jnp.stack([x1, y1, x2, y2], axis=0)                # [4, k] planar
    top_valid = top_scores > -1e9
    # top_k output is descending -> presorted single-launch NMS sweep
    # (see models/rpn.py::generate_proposals)
    # use_kernel=False default: the pyramid's stride-4/8 convs are space-to-
    # batch eligible, and a Pallas NMS call downstream was measured (round 1)
    # to forfeit their s2b rewrites — the XLA while-loop sweep keeps them
    # intact. Switchable for in-context A/B (tools/microbench_fpn.py).
    keep_idx, real = nms_topk_presorted(top_bT, top_scores, top_valid,
                                        nms_thresh, post_nms_top_n,
                                        use_kernel=use_kernel)
    return top_bT[:, keep_idx].T, top_scores[keep_idx], real
