"""Cached-proposal workflow: dump -> recall eval -> roidb merge -> RCNN-only train."""

import numpy as np
import jax
import jax.numpy as jnp

from relation_tpu.core.trainer import build_model, create_train_state
from relation_tpu.core.rpn_workflow import (generate_rpn_proposals,
                                            evaluate_recall,
                                            load_proposal_roidb,
                                            make_train_step_rcnn)
from tests.test_train_predict import tiny_cfg


class FakeLoader:
    def __init__(self, items):
        self.items = items

    def __iter__(self):
        return iter(self.items)

    def __len__(self):
        return len(self.items)


def test_proposal_dump_recall_and_rcnn_train(rng, tmp_path):
    cfg = tiny_cfg()
    cfg.TRAIN.LEARN_NMS = False
    cfg.TEST.LEARN_NMS = False
    cfg.TRAIN.ENABLE_OHEM = False
    cfg.TRAIN.BATCH_ROIS = 16
    cfg.TEST.PROPOSAL_PRE_NMS_TOP_N = 64
    cfg.TEST.PROPOSAL_POST_NMS_TOP_N = 24
    cfg.TEST.PROPOSAL_MIN_SIZE = 0
    cfg.symbol = "resnet_v1_101_rcnn"
    model = build_model(cfg, tiny=True)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               jnp.zeros((64, 64, 3)),
                               jnp.asarray([64.0, 64.0, 1.0]))

    # fake test loader: 3 images
    items = [(i, rng.randn(64, 64, 3).astype(np.float32),
              np.asarray([64.0, 64.0, 1.0], np.float32)) for i in range(3)]
    out = generate_rpn_proposals(model, state.params, cfg, None,
                                 str(tmp_path / "rpn.pkl"),
                                 loader=FakeLoader(items))

    # roidb with gt for recall + merge
    roidb = []
    for i in range(3):
        boxes = np.asarray([[5, 5, 30, 30], [20, 25, 50, 55]], np.float32)
        roidb.append({"image": f"im{i}", "image_id": i, "height": 64, "width": 64,
                      "boxes": boxes, "gt_classes": np.asarray([1, 2], np.int32),
                      "iscrowd": np.zeros(2, bool), "flipped": False})

    import pickle
    props = pickle.load(open(out, "rb"))
    assert len(props) == 3 and props[0].shape[1] == 5

    rec = evaluate_recall(roidb, props)
    assert 0.0 <= rec["ar"] <= 1.0 and rec["num_gt"] == 6

    merged = load_proposal_roidb(roidb, out, top_rois=20)
    assert merged[0]["proposals"].shape[1] == 4

    # RCNN-only train step on the cached proposals
    R, G = 20, 4
    step = make_train_step_rcnn(model, cfg, max_rois=R, max_gt=G)
    B = 2
    rois = np.zeros((B, R, 4), np.float32)
    rv = np.zeros((B, R), bool)
    gt = np.zeros((B, G, 5), np.float32)
    gv = np.zeros((B, G), bool)
    for b in range(B):
        p = merged[b]["proposals"][:R]
        rois[b, :len(p)] = p
        rv[b, :len(p)] = True
        gt[b, :2, :4] = merged[b]["boxes"]
        gt[b, :2, 4] = merged[b]["gt_classes"]
        gv[b, :2] = True
    batch = {"image": rng.randn(B, 64, 64, 3).astype(np.float32),
             "im_info": np.tile([[64, 64, 1.0]], (B, 1)).astype(np.float32),
             "rois": rois, "rois_valid": rv, "gt_boxes": gt, "gt_valid": gv}
    state2, metrics = jax.jit(step)(state, jax.tree.map(jnp.asarray, batch))
    m = jax.tree.map(float, metrics)
    assert np.isfinite(m["total_loss"])
    assert {"rcnn_cls_loss", "rcnn_bbox_loss", "rcnn_acc"} <= set(m)


def test_rpn_only_train_step(rng):
    from relation_tpu.core.rpn_workflow import make_train_step_rpn
    cfg = tiny_cfg()
    cfg.TRAIN.LEARN_NMS = False
    cfg.TEST.LEARN_NMS = False
    cfg.symbol = "resnet_v1_101_rcnn"
    model = build_model(cfg, tiny=True)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               jnp.zeros((64, 64, 3)),
                               jnp.asarray([64.0, 64.0, 1.0]))
    step = make_train_step_rpn(model, cfg, max_gt=4)
    from tests.test_train_predict import make_batch
    batch = jax.tree.map(jnp.asarray, make_batch(rng, B=2))
    state2, metrics = jax.jit(step)(state, batch)
    m = jax.tree.map(float, metrics)
    assert np.isfinite(m["total_loss"])
    assert set(m) == {"rpn_cls_loss", "rpn_bbox_loss", "rpn_acc", "total_loss"}


def test_symbol_registry_relation_rule():
    from relation_tpu.core.trainer import build_model
    from tests.test_train_predict import tiny_cfg
    cfg = tiny_cfg()
    # learn-NMS-only variant: plain head, learned NMS on top (reference
    # resnet_v1_101_rcnn_learn_nms_1024_attention_*.py has no head relation)
    cfg.symbol = "resnet_v1_101_rcnn_learn_nms_1024_attention_1024_pairwise_position_multi_head_16"
    m = build_model(cfg, tiny=True)
    assert not m.use_relation and m.use_learn_nms
    cfg.symbol = "resnet_v1_101_rcnn_attention_1024_pairwise_position_multi_head_16_learn_nms"
    m = build_model(cfg, tiny=True)
    assert m.use_relation and m.use_learn_nms


def test_predict_from_cached_proposals(rng):
    """HAS_RPN=false eval path: head inference on provided rois."""
    from relation_tpu.core.predictor import make_predict_fn_rcnn
    cfg = tiny_cfg()
    cfg.TRAIN.LEARN_NMS = False
    cfg.TEST.LEARN_NMS = False
    cfg.TEST.HAS_RPN = False
    cfg.TEST.NMS = 0.5
    cfg.symbol = "resnet_v1_101_rcnn"
    model = build_model(cfg, tiny=True)
    img = jnp.asarray(rng.randn(64, 64, 3).astype(np.float32))
    R = 20
    x1 = rng.uniform(0, 40, R); y1 = rng.uniform(0, 40, R)
    rois = jnp.asarray(np.stack([x1, y1, x1 + 20, y1 + 20], 1).astype(np.float32))
    valid = jnp.asarray(np.arange(R) < 15)
    params = model.init(jax.random.PRNGKey(0), img, rois,
                        jnp.asarray([64.0, 64.0, 1.0]), R)["params"]
    fn = make_predict_fn_rcnn(model, cfg)
    out = fn(params, img, jnp.asarray([64.0, 64.0, 1.0]), rois, valid)
    dets = np.asarray(out["dets"])
    assert dets.shape == (cfg.TEST.max_per_image, 6)
