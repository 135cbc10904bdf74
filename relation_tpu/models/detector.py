"""Detector assembly: Faster R-CNN (ResNet-101) with optional Relation modules and
learned NMS — the TPU-native equivalent of the reference "symbol" layer.

Reference graph being mirrored (plain / relation / learn-nms variants):
  symbols/resnet_v1_101_rcnn.py, symbols/resnet_v1_101_rcnn_attention_1024_pairwise_
  position_multi_head_16[_learn_nms].py:240-569

Structure:
  image (NHWC, fixed bucket) -> ResNet101 C4 (stride 16) -> RPN head
                                     |                         |
                                     v                         v
                               C5 (dilated)            on-device proposals
                                     \\                        /
                                  conv_new_1 (1x1, 256) + ROI pool 7x7
                                     -> fc_new_1 (+relation) -> fc_new_2 (+relation)
                                     -> cls_score / bbox_pred [-> learned NMS head]

Everything below the image is a single jit region per mode; no host round trips.
The module is per-image; the trainer vmaps/shards over the batch.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from relation_tpu.models.backbone import ResNet101C4, ResNet101C5
from relation_tpu.models.rpn import RPNHead
from relation_tpu.models.relation import RelationModule
from relation_tpu.models.learn_nms import LearnNMSHead
from relation_tpu.ops.embeddings import extract_position_matrix_t
from relation_tpu.ops.roi_pool import roi_align_mxu, roi_pool

_norm_init = nn.initializers.normal(0.01)


class RelationRCNN(nn.Module):
    """Full detector. Methods (used via ``apply(..., method=...)``):

    - ``features_and_rpn(image)`` -> (c5_feat_reduced, rpn_cls, rpn_bbox)
    - ``head(reduced_feat, rois, nongt_dim)`` -> (cls_score, bbox_pred, fc_all_2)
    - ``learn_nms(cls_score, bbox_pred, rois, roi_feat, im_info)`` -> dict

    Static configuration mirrors the experiment YAML fields.
    """
    num_classes: int = 81
    num_anchors: int = 12
    class_agnostic: bool = True
    use_relation: bool = True
    use_learn_nms: bool = True
    first_n: int = 100
    num_thresh: int = 5
    bbox_means: tuple | None = None
    bbox_stds: tuple | None = None
    roi_method: str = "align"           # "align" (TPU default) | "pool" (exact ref)
    dcn: bool = False                   # deformable res5 + deformable ROI pooling
    # compute dtype for the DCN deformable-PSROI pooling (both passes): the
    # separable-MXU einsums stage in this dtype. bf16 on TPU (the head
    # backward measured 8.0 ms/img at B=4 in f32, r5); parity eval flips to
    # f32 via TPU.DCN_POOL_DTYPE (experiments/test.py __meta__ handling)
    dcn_pool_dtype: Any = jnp.float32
    rcnn_feat_stride: int = 16
    conv_dtype: Any = jnp.bfloat16
    # compute dtype for the ROI-head FCs and relation attention matmuls
    # (softmax and the cls/bbox output layers always run f32)
    head_dtype: Any = jnp.float32
    # sinusoid dtype for the XLA geometric-bias path (unused on the C4 fast
    # path, which runs the fused Pallas bias kernel — see models/relation.py)
    geom_emb_dtype: Any = None
    # XLA learned-NMS attention: active-class gather cap (models/relation.py;
    # unused on the C4 fast path, which runs the Pallas skip kernel)
    compact_classes: int = 32
    # Pallas in the learned-NMS head (the per-class geom-bias kernel + skip
    # kernel). False = the XLA dense/compact attention (the FPN-style path):
    # under the train step's vmap the per-class kernel becomes B*C
    # sequential grid programs (program-overhead floor ~7-14 us each), while
    # the XLA form batches — A/B via cfg.TPU.LNMS_ATTN (r5).
    lnms_allow_pallas: bool = True
    # tiny-model knobs for tests
    backbone: str = "resnet101"         # "resnet101" | "tiny"
    head_dim: int = 1024
    # stop_gradient after this trunk stage (FIXED_PARAMS grad_req='null'
    # analogue, reference core/module.py:753-773; see ResNet101C4)
    freeze_through: int = 0

    def setup(self):
        if self.backbone == "resnet101":
            self.c4 = ResNet101C4(dtype=self.conv_dtype,
                                  freeze_through=self.freeze_through)
            if self.dcn:
                from relation_tpu.models.backbone import ResNet101C5DCN
                self.c5 = ResNet101C5DCN(dtype=self.conv_dtype)
            else:
                self.c5 = ResNet101C5(dtype=self.conv_dtype)
        else:
            # minimal stand-in trunk with the same contract (stride 16)
            self.c4 = _TinyTrunk(dtype=self.conv_dtype)
            self.c5 = lambda x: x
        self.rpn = RPNHead(num_anchors=self.num_anchors, dtype=self.conv_dtype)
        self.conv_new_1 = nn.Conv(256, (1, 1), dtype=self.conv_dtype,
                                  param_dtype=jnp.float32, name="conv_new_1",
                                  kernel_init=_norm_init)
        if self.dcn:
            # DCN head offset branch (reference rcnn_dcn.py:864-867, lr_mult 0.01,
            # zero init)
            self.offset_fc = nn.Dense(7 * 7 * 2, name="offset",
                                      kernel_init=nn.initializers.zeros)
        self.fc_new_1 = nn.Dense(self.head_dim, name="fc_new_1",
                                 dtype=self.head_dtype,
                                 param_dtype=jnp.float32,
                                 kernel_init=_norm_init)
        self.fc_new_2 = nn.Dense(self.head_dim, name="fc_new_2",
                                 dtype=self.head_dtype,
                                 param_dtype=jnp.float32,
                                 kernel_init=_norm_init)
        if self.use_relation:
            self.relation_1 = RelationModule(index=1, dim_qk=self.head_dim,
                                             dim_out=self.head_dim,
                                             dtype=self.head_dtype,
                                             geom_emb_dtype=self.geom_emb_dtype)
            self.relation_2 = RelationModule(index=2, dim_qk=self.head_dim,
                                             dim_out=self.head_dim,
                                             dtype=self.head_dtype,
                                             geom_emb_dtype=self.geom_emb_dtype)
        self.cls_score = nn.Dense(self.num_classes, name="cls_score",
                                  kernel_init=_norm_init)
        num_reg = 2 if self.class_agnostic else self.num_classes
        self.bbox_pred = nn.Dense(4 * num_reg, name="bbox_pred",
                                  kernel_init=_norm_init)
        if self.use_learn_nms:
            self.learn_nms_head = LearnNMSHead(
                num_fg_classes=self.num_classes - 1, first_n=self.first_n,
                num_thresh=self.num_thresh, class_agnostic=self.class_agnostic,
                bbox_means=self.bbox_means, bbox_stds=self.bbox_stds,
                attn_dtype=self.head_dtype,
                allow_pallas=self.lnms_allow_pallas,
                geom_emb_dtype=self.geom_emb_dtype,
                compact_classes=self.compact_classes)

    def features_and_rpn(self, image, res4_folded=None):
        """image [H, W, 3] / s2d [12, Ho, Wo] (mean-subtracted BGR, fixed
        bucket) -> (head_feat [H/16, W/16, 256], rpn_cls [h,w,A,2],
        rpn_bbox [h,w,A,4]).

        A 4D input is treated as an explicit batch and returns batch-leading
        outputs — the trainer runs the conv trunk natively batched (batched
        convs == vmapped convs for XLA, but the Pallas stem's B==1 guard then
        dispatches correctly instead of going through vmap's pallas batching,
        which VMEM-OOMs at B>=4).

        ``res4_folded``: optional precomputed BN-folded res4 weight stacks
        (backbone.fold_res4_params) enabling the fused Pallas res4 kernel."""
        batched = image.ndim == 4
        x = image if batched else image[None]
        if self.backbone == "resnet101":
            c4_feat = self.c4(x, res4_folded)             # [B, h, w, 1024]
        else:
            c4_feat = self.c4(x)
        rpn_cls, rpn_bbox = self.rpn(c4_feat)
        c5_feat = self.c5(c4_feat)                        # [B, h, w, 2048]
        reduced = nn.relu(self.conv_new_1(c5_feat))       # [B, h, w, 256]
        if batched:
            return reduced, rpn_cls, rpn_bbox
        return reduced[0], rpn_cls[0], rpn_bbox[0]

    def head(self, reduced_feat, rois, nongt_dim: int, pool_only: bool = False):
        """ROI head. rois: [N, 4] (image coords). Returns
        (cls_score [N, num_classes], bbox_pred [N, 4*num_reg], fc_all_2_relu [N, D]).

        ``pool_only`` returns the flattened pooled features early — a
        benchmarking cut for the forward-stage profile
        (tools/microbench_train_cuts.py stop_after='pool')."""
        scale = 1.0 / self.rcnn_feat_stride
        if self.dcn:
            # deformable PSROI head (reference rcnn_dcn.py:864-873): a no-trans
            # pooled feature predicts per-bin offsets, which steer a second pool
            from relation_tpu.ops.deform import deformable_psroi_pool
            pf = reduced_feat.astype(self.dcn_pool_dtype)
            offset_t = deformable_psroi_pool(pf, rois, None, scale,
                                             pooled_size=7, sample_per_part=4)
            off = self.offset_fc(
                offset_t.reshape(rois.shape[0], -1).astype(jnp.float32))
            off = off.reshape(-1, 2, 7, 7)
            pooled = deformable_psroi_pool(pf, rois, off, scale, pooled_size=7,
                                           sample_per_part=4, trans_std=0.1)
        elif self.roi_method == "align":
            pooled = roi_align_mxu(reduced_feat, rois, scale, 7)
        else:
            pooled = roi_pool(reduced_feat, rois, scale, 7)
        flat = pooled.reshape(pooled.shape[0], -1).astype(jnp.float32)
        if pool_only:
            return flat

        if self.use_relation:
            pos_t = extract_position_matrix_t(rois, nongt_dim=nongt_dim)

        x = self.fc_new_1(flat)
        if self.use_relation:
            x = x + self.relation_1(x, pos_t)
        x = nn.relu(x)
        x = self.fc_new_2(x)
        if self.use_relation:
            x = x + self.relation_2(x, pos_t)
        fc_all_2_relu = nn.relu(x)

        return (self.cls_score(fc_all_2_relu), self.bbox_pred(fc_all_2_relu),
                fc_all_2_relu)

    def learn_nms(self, cls_score, bbox_pred, rois, roi_feat, im_info,
                  class_thresh: float = 0.0, probe: str = ""):
        return self.learn_nms_head(cls_score, bbox_pred, rois, roi_feat, im_info,
                                   class_thresh=class_thresh, probe=probe)

    def __call__(self, image, rois, im_info, nongt_dim: int):
        """Convenience single-pass forward (inference graph shape-check path)."""
        feat, rpn_cls, rpn_bbox = self.features_and_rpn(image)
        cls_s, bbox_p, fc2 = self.head(feat, rois, nongt_dim)
        out = {"rpn_cls": rpn_cls, "rpn_bbox": rpn_bbox,
               "cls_score": cls_s, "bbox_pred": bbox_p, "roi_feat": fc2}
        if self.use_learn_nms:
            out.update(self.learn_nms(cls_s[:nongt_dim], bbox_p[:nongt_dim],
                                      rois[:nongt_dim], fc2[:nongt_dim], im_info))
        return out


class _TinyTrunk(nn.Module):
    """Stride-16 toy trunk used only in tests (keeps compile time sane on 1 CPU)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if x.ndim == 4 and x.shape[1] == 12:
            # accept the s2d planar input layout (see ResNet101C4); undo it —
            # this trunk only runs on CPU in tests, layout cost is irrelevant
            B, K, Ho, Wo = x.shape
            x = (x.reshape(B, 2, 2, 3, Ho, Wo)
                 .transpose(0, 4, 1, 5, 2, 3)
                 .reshape(B, 2 * Ho, 2 * Wo, 3))
        for i in range(4):
            x = nn.Conv(32, (3, 3), strides=(2, 2), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"tiny{i}")(x)
            x = nn.relu(x)
        return x
