"""Per-stage timing of the flagship inference pipeline on the real TPU chip.

Stages: backbone+RPN (features_and_rpn), proposal generation (incl. greedy
NMS), ROI head (relation-augmented 2FC), learned-NMS head + final selection.
Uses the roll-feedback serial-chain timer (tools/microbench.py).
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

from microbench import timeit_us

sys.path.insert(0, "/root/repo")


def main():
    from __graft_entry__ import entry, _flagship_cfg
    from relation_tpu.core.trainer import build_model
    from relation_tpu.core.predictor import make_predict_fn
    from relation_tpu.models.detector import RelationRCNN
    from relation_tpu.models.rpn import generate_proposals
    from relation_tpu.ops.anchors import generate_anchors, shift_anchors

    cfg = _flagship_cfg()
    model = build_model(cfg)
    fn, (params, image, im_info) = entry()
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.randn(*image.shape).astype(np.float32) * 40.0)

    stride = int(cfg.network.RPN_FEAT_STRIDE)
    base_anchors = generate_anchors(stride, tuple(cfg.network.ANCHOR_RATIOS),
                                    tuple(cfg.network.ANCHOR_SCALES))

    def backbone(image):
        feat, rpn_cls, rpn_bbox = model.apply(
            {"params": params}, image, method=RelationRCNN.features_and_rpn)
        return feat

    t_bb = timeit_us(backbone, image, n=30)
    print(f"backbone+rpn      {t_bb:8.1f} us")

    feat, rpn_cls, rpn_bbox = jax.jit(lambda im: model.apply(
        {"params": params}, im, method=RelationRCNN.features_and_rpn))(image)
    fh, fw = rpn_cls.shape[0], rpn_cls.shape[1]
    def proposals(rpn_cls):
        fg_prob = jax.nn.softmax(rpn_cls, axis=-1)[..., 1]
        rois, s, r = generate_proposals(
            fg_prob, rpn_bbox, base_anchors, im_info, stride,
            int(cfg.TEST.RPN_PRE_NMS_TOP_N), int(cfg.TEST.RPN_POST_NMS_TOP_N),
            float(cfg.TEST.RPN_NMS_THRESH), float(cfg.TEST.RPN_MIN_SIZE))
        return rois

    t_prop = timeit_us(proposals, rpn_cls, n=30)
    print(f"proposals+nms     {t_prop:8.1f} us")

    rois = jax.jit(proposals)(rpn_cls)
    nongt = int(cfg.TEST.RPN_POST_NMS_TOP_N)

    def head(feat):
        cls_score, bbox_deltas, fc2 = model.apply(
            {"params": params}, feat, rois, nongt,
            method=RelationRCNN.head)
        return cls_score

    t_head = timeit_us(head, feat, n=30)
    print(f"roi head          {t_head:8.1f} us")

    cls_score, bbox_deltas, fc2 = jax.jit(lambda f: model.apply(
        {"params": params}, f, rois, nongt, method=RelationRCNN.head))(feat)

    def lnms(cls_score):
        ln = model.apply({"params": params}, cls_score, bbox_deltas, rois, fc2,
                         im_info, method=RelationRCNN.learn_nms)
        return ln["nms_multi_score"]

    t_lnms = timeit_us(lnms, cls_score, n=30)
    print(f"learned nms       {t_lnms:8.1f} us")

    print(f"sum of stages     {t_bb + t_prop + t_head + t_lnms:8.1f} us")


if __name__ == "__main__":
    main()
