"""Learning-sanity tests: the full train step must actually fit data.

These catch loss-sign/target-assignment/gradient-flow bugs that shape tests can't:
overfit a fixed synthetic scene and check (a) losses fall, (b) the detector's
final detections recover the ground-truth boxes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from relation_tpu.core.trainer import build_model, create_train_state, make_train_step
from relation_tpu.core.predictor import make_predict_fn
from tests.test_train_predict import tiny_cfg


def make_scene(rng, size=64, max_gt=4):
    """One fixed image with two high-contrast boxes on distinct backgrounds."""
    img = np.zeros((size, size, 3), np.float32)
    gt = np.zeros((max_gt, 5), np.float32)
    gv = np.zeros((max_gt,), bool)
    boxes = [(6, 8, 26, 30, 1), (36, 34, 58, 56, 2)]
    for i, (x1, y1, x2, y2, c) in enumerate(boxes):
        img[y1:y2 + 1, x1:x2 + 1, :] = rng.uniform(4, 6, 3) * (1 if c == 1 else -1)
        gt[i] = [x1, y1, x2, y2, c]
        gv[i] = True
    img += rng.randn(size, size, 3) * 0.3
    return img, gt, gv


@pytest.mark.slow
def test_overfit_synthetic_scene(rng):
    cfg = tiny_cfg()
    cfg.TRAIN.ENABLE_OHEM = False
    cfg.TRAIN.lr = 0.01
    cfg.TRAIN.lr_step = ""
    # the smoke lr is ~20x the reference schedule (train_end2end.py lr=0.0005)
    # to converge in 600 steps; at that lr the spiky learned-NMS+bbox feedback
    # can diverge on fp-rounding luck (observed: any graph change reshuffles
    # the trajectory; loss 10 -> 1.8e4 -> nan within 4 steps). Clip like any
    # high-lr run would — production default stays None for reference parity.
    cfg.TPU.GRAD_CLIP = 5.0
    # classic path for the localization check: the learned-NMS conditional score
    # needs far more steps to calibrate than a smoke test allows; its losses are
    # still asserted to fall below
    cfg.TEST.LEARN_NMS = False
    cfg.TEST.SOFTNMS = False
    cfg.TEST.NMS = 0.5
    model = build_model(cfg, tiny=True)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               jnp.zeros((64, 64, 3)),
                               jnp.asarray([64.0, 64.0, 1.0]))
    step = jax.jit(make_train_step(model, cfg))

    img, gt, gv = make_scene(rng)
    batch = {
        "image": jnp.asarray(img[None].repeat(2, 0)),
        "im_info": jnp.asarray([[64.0, 64.0, 1.0]] * 2),
        "gt_boxes": jnp.asarray(gt[None].repeat(2, 0)),
        "gt_valid": jnp.asarray(gv[None].repeat(2, 0)),
    }

    first, last = None, None
    max_pos_loss = 0.0
    for i in range(600):
        state, metrics = step(state, batch)
        if i == 0:
            first = jax.tree.map(float, metrics)
        max_pos_loss = max(max_pos_loss, float(metrics["nms_pos_loss"]))
    last = jax.tree.map(float, metrics)

    # every loss must drop substantially
    assert last["rpn_cls_loss"] < 0.5 * first["rpn_cls_loss"], (first, last)
    assert last["rcnn_cls_loss"] < 0.5 * first["rcnn_cls_loss"], (first, last)
    # NOTE total_loss is NOT asserted: the learned-NMS positive term ENGAGES as
    # boxes start matching gt (progress that raises the total); component losses
    # are the meaningful signals
    # learned-NMS: the multi-threshold targets must have fired during training
    # (positive term engaged); exact end-state accuracy is init-luck-sensitive
    # on 600 smoke steps, so only the structural signal is asserted
    assert max_pos_loss > 0.0, "nms positive targets never fired"
    assert last["rcnn_acc"] > 0.8, last

    # the detector must localize: RPN proposals cover the gts, and at least one
    # gt is recovered among the top detections (400 steps from scratch is a smoke
    # bar, not convergence)
    predict = make_predict_fn(model, cfg, feat_hw=(4, 4))
    out = predict(state.params, batch["image"][0], batch["im_info"][0])
    from tests.reference_impls import np_bbox_overlaps
    rois = np.asarray(out["rois"])
    prop_iou = np_bbox_overlaps(rois.astype(float),
                                gt[gv, :4].astype(float)).max(axis=0)
    assert (prop_iou > 0.25).all(), f"proposal recall too low: {prop_iou}"

    dets = np.asarray(out["dets"])
    real = dets[dets[:, 0] >= 1]
    assert len(real) > 0
    found = 0
    for x1, y1, x2, y2, c in [(6, 8, 26, 30, 1), (36, 34, 58, 56, 2)]:
        gt_box = np.asarray([x1, y1, x2, y2], np.float32)
        for row in real[:10]:
            bw = np.maximum(row[2:6], 0)
            ix1 = max(bw[0], gt_box[0]); iy1 = max(bw[1], gt_box[1])
            ix2 = min(bw[2], gt_box[2]); iy2 = min(bw[3], gt_box[3])
            inter = max(0, ix2 - ix1 + 1) * max(0, iy2 - iy1 + 1)
            a1 = (bw[2] - bw[0] + 1) * (bw[3] - bw[1] + 1)
            a2 = (gt_box[2] - gt_box[0] + 1) * (gt_box[3] - gt_box[1] + 1)
            if inter / (a1 + a2 - inter) > 0.3:
                found += 1
                break
    assert found >= 1, f"no gt box recovered; dets={real[:6]}"
