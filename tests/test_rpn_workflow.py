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


def test_rcnn_train_step_learn_nms(rng):
    """Learn-NMS + relation branch in the cached-proposal trainer (the
    reference trains its best FPN numbers through function/train_rcnn.py with
    the *_learn_nms symbols): losses finite and falling."""
    cfg = tiny_cfg()                      # learn-NMS + relation, BATCH_ROIS=-1
    model = build_model(cfg, tiny=True)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               jnp.zeros((64, 64, 3)),
                               jnp.asarray([64.0, 64.0, 1.0]))
    R, G, B = 20, 4, 1
    step = jax.jit(make_train_step_rcnn(model, cfg, max_rois=R, max_gt=G))
    x1 = rng.uniform(0, 30, (B, R)); y1 = rng.uniform(0, 30, (B, R))
    rois = np.stack([x1, y1, x1 + rng.uniform(8, 30, (B, R)),
                     y1 + rng.uniform(8, 30, (B, R))], -1).astype(np.float32)
    gt = np.zeros((B, G, 5), np.float32)
    gt[:, 0] = [10, 10, 30, 30, 1]
    gt[:, 1] = [25, 30, 55, 60, 2]
    gv = np.zeros((B, G), bool); gv[:, :2] = True
    batch = jax.tree.map(jnp.asarray, {
        "image": rng.randn(B, 64, 64, 3).astype(np.float32),
        "im_info": np.tile([[64, 64, 1.0]], (B, 1)).astype(np.float32),
        "rois": rois, "rois_valid": np.ones((B, R), bool),
        "gt_boxes": gt, "gt_valid": gv})
    losses = []
    for _ in range(4):
        state, m = step(state, batch)
        m = jax.tree.map(float, m)
        assert {"nms_pos_loss", "nms_neg_loss", "nms_acc_pos",
                "nms_acc_neg"} <= set(m)
        for k, v in m.items():
            assert np.isfinite(v), (k, v)
        losses.append(m["total_loss"])
    assert losses[-1] < losses[0], losses


def test_rcnn_train_step_custom_bbox_stats(rng):
    """Roidb-computed means/stds thread through (bbox_regression.py:82-100)."""
    cfg = tiny_cfg()
    cfg.TRAIN.LEARN_NMS = False
    cfg.TEST.LEARN_NMS = False
    cfg.TRAIN.ENABLE_OHEM = False
    cfg.TRAIN.BATCH_ROIS = 16
    cfg.TRAIN.BBOX_NORMALIZATION_PRECOMPUTED = False
    cfg.symbol = "resnet_v1_101_rcnn"
    model = build_model(cfg, tiny=True)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               jnp.zeros((64, 64, 3)),
                               jnp.asarray([64.0, 64.0, 1.0]))
    R, G = 16, 4
    step = jax.jit(make_train_step_rcnn(
        model, cfg, max_rois=R, max_gt=G,
        bbox_means=(0.01, -0.02, 0.1, 0.05), bbox_stds=(0.1, 0.1, 0.2, 0.2)))
    x1 = rng.uniform(0, 30, (1, R)); y1 = rng.uniform(0, 30, (1, R))
    rois = np.stack([x1, y1, x1 + 20, y1 + 20], -1).astype(np.float32)
    gt = np.zeros((1, G, 5), np.float32); gt[:, 0] = [10, 10, 30, 30, 1]
    gv = np.zeros((1, G), bool); gv[:, 0] = True
    batch = jax.tree.map(jnp.asarray, {
        "image": rng.randn(1, 64, 64, 3).astype(np.float32),
        "im_info": np.asarray([[64, 64, 1.0]], np.float32),
        "rois": rois, "rois_valid": np.ones((1, R), bool),
        "gt_boxes": gt, "gt_valid": gv})
    _, m = step(state, batch)
    assert np.isfinite(float(m["total_loss"]))


def test_rcnn_train_step_sharded_dp_parity(rng):
    """8-device DP parity for the cached-proposal trainer (the same proof as
    test_train_predict.py::test_train_step_sharded_dp_parity, for the
    reference's function/train_rcnn.py stage)."""
    from relation_tpu.parallel.mesh import make_mesh, shard_batch, replicated
    from tests.test_train_predict import assert_tree_allclose
    cfg = tiny_cfg()
    cfg.TRAIN.LEARN_NMS = False
    cfg.TEST.LEARN_NMS = False
    cfg.TRAIN.ENABLE_OHEM = False
    cfg.TRAIN.BATCH_ROIS = 16
    cfg.symbol = "resnet_v1_101_rcnn"
    model = build_model(cfg, tiny=True)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               jnp.zeros((64, 64, 3)),
                               jnp.asarray([64.0, 64.0, 1.0]))
    R, G, B = 16, 4, 8
    step = make_train_step_rcnn(model, cfg, max_rois=R, max_gt=G)
    x1 = rng.uniform(0, 30, (B, R)); y1 = rng.uniform(0, 30, (B, R))
    rois = np.stack([x1, y1, x1 + rng.uniform(8, 30, (B, R)),
                     y1 + rng.uniform(8, 30, (B, R))], -1).astype(np.float32)
    gt = np.zeros((B, G, 5), np.float32)
    gt[:, 0] = [10, 10, 30, 30, 1]
    gt[:, 1] = [25, 30, 55, 60, 2]
    gv = np.zeros((B, G), bool); gv[:, :2] = True
    host_batch = {"image": rng.randn(B, 64, 64, 3).astype(np.float32),
                  "im_info": np.tile([[64, 64, 1.0]], (B, 1)).astype(np.float32),
                  "rois": rois, "rois_valid": np.ones((B, R), bool),
                  "gt_boxes": gt, "gt_valid": gv}

    ref_state, ref_metrics = jax.jit(step)(
        state, jax.tree.map(jnp.asarray, host_batch))
    ref_metrics = jax.tree.map(float, ref_metrics)
    assert np.isfinite(ref_metrics["total_loss"])

    mesh = make_mesh(n_data=8)
    sstate = jax.device_put(state, replicated(mesh))
    with mesh:
        state2, metrics = jax.jit(step)(sstate, shard_batch(mesh, host_batch))
    assert len(jax.tree.leaves(state2.params)[0].sharding.device_set) == 8
    assert_tree_allclose(jax.tree.map(np.asarray, ref_state.params),
                         jax.tree.map(np.asarray, state2.params),
                         rtol=1e-4, atol=1e-6, what="params")
    for k, v in jax.tree.map(float, metrics).items():
        np.testing.assert_allclose(v, ref_metrics[k], rtol=1e-4, atol=1e-6,
                                   err_msg=f"metric {k}")


def test_rcnn_train_step_train_shared_freeze(rng):
    """train_shared=True freezes the RPN-shared trunk via FIXED_PARAMS_SHARED
    (reference function/train_rcnn.py:119-123): trunk params must be
    bit-unchanged after a step while head params move."""
    from relation_tpu.core.trainer import refreeze_state, trainable_mask
    cfg = tiny_cfg()
    cfg.TRAIN.LEARN_NMS = False
    cfg.TEST.LEARN_NMS = False
    cfg.TRAIN.ENABLE_OHEM = False
    cfg.TRAIN.BATCH_ROIS = 16
    cfg.symbol = "resnet_v1_101_rcnn"
    cfg.network.FIXED_PARAMS_SHARED = ["tiny", "rpn", "gamma", "beta"]
    model = build_model(cfg, tiny=True)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               jnp.zeros((64, 64, 3)),
                               jnp.asarray([64.0, 64.0, 1.0]))
    state = refreeze_state(state, cfg, cfg.network.FIXED_PARAMS_SHARED)
    R, G = 16, 4
    step = make_train_step_rcnn(model, cfg, max_rois=R, max_gt=G,
                                train_shared=True)
    x1 = rng.uniform(0, 30, (1, R)); y1 = rng.uniform(0, 30, (1, R))
    rois = np.stack([x1, y1, x1 + rng.uniform(8, 30, (1, R)),
                     y1 + rng.uniform(8, 30, (1, R))], -1).astype(np.float32)
    gt = np.zeros((1, G, 5), np.float32)
    gt[:, 0] = [10, 10, 30, 30, 1]
    gv = np.zeros((1, G), bool); gv[:, 0] = True
    batch = {"image": rng.randn(1, 64, 64, 3).astype(np.float32),
             "im_info": np.asarray([[64, 64, 1.0]], np.float32),
             "rois": rois, "rois_valid": np.ones((1, R), bool),
             "gt_boxes": gt, "gt_valid": gv}
    p0 = jax.tree.map(np.asarray, state.params)
    state2, m = jax.jit(step)(state, jax.tree.map(jnp.asarray, batch))
    assert np.isfinite(float(m["total_loss"]))
    p1 = jax.tree.map(np.asarray, state2.params)
    mask = trainable_mask(state.params, cfg.network.FIXED_PARAMS_SHARED)
    moved, frozen_same = [], []
    jax.tree.map(lambda t, a, b: (moved if t else frozen_same).append(
        np.any(a != b) if t else np.array_equal(a, b)), mask, p0, p1)
    assert any(moved), "no head param moved under train_shared"
    assert all(frozen_same), "a FIXED_PARAMS_SHARED param moved"


def test_add_bbox_regression_stats_oracle():
    """Class-agnostic stats equal a direct mean/std of the candidate targets
    (reference add_bbox_regression_targets, bbox_regression.py:82-100)."""
    from relation_tpu.core.rpn_workflow import (add_bbox_regression_stats,
                                                _np_bbox_transform)
    gt = np.asarray([[10, 10, 40, 50], [60, 20, 90, 70]], np.float32)
    props = np.asarray([[12, 8, 38, 52],     # overlaps gt0 well
                        [58, 22, 88, 66],    # overlaps gt1 well
                        [0, 0, 5, 5]], np.float32)   # background, below thresh
    roidb = [{"boxes": gt, "gt_classes": np.asarray([1, 2]),
              "iscrowd": np.zeros(2, bool), "proposals": props}]
    means, stds = add_bbox_regression_stats(roidb, 3, True, 0.5)
    # candidates >= 0.5 IoU: the 2 gt rows (targets 0) + first 2 proposals
    cand = np.concatenate([np.zeros((2, 4)),
                           _np_bbox_transform(props[:2],
                                              gt)], axis=0)
    np.testing.assert_allclose(means[1], cand.mean(axis=0), atol=1e-6)
    np.testing.assert_allclose(stds[1], cand.std(axis=0), atol=1e-6)
    assert means.shape == (2, 4) and (means[0] == 0).all()


def test_evaluate_recall_area_breakdown():
    """Greedy one-to-one matching + per-area recall (imdb.py:286-379)."""
    # one image: 2 gt (one small 20x20=400 in '0-25', one 60x60 in '50-100'),
    # one proposal exactly covering the small gt only
    gt = np.asarray([[0, 0, 19, 19], [100, 100, 159, 159]], np.float32)
    roidb = [{"boxes": gt, "gt_classes": np.asarray([1, 1]),
              "iscrowd": np.zeros(2, bool)}]
    props = [np.asarray([[0, 0, 19, 19, 0.9]], np.float32)]
    rec = evaluate_recall(roidb, props)
    assert rec["num_gt"] == 2
    # all-range: 1 of 2 gt covered at every threshold
    np.testing.assert_allclose(rec["areas"]["all"]["recalls"], 0.5)
    np.testing.assert_allclose(rec["areas"]["0-25"]["recalls"], 1.0)
    assert rec["areas"]["50-100"]["num_pos"] == 1
    np.testing.assert_allclose(rec["areas"]["50-100"]["recalls"], 0.0)
    assert abs(sum(rec["proposal_area_pct"].values()) - 1.0) < 1e-6


def test_evaluate_recall_greedy_one_to_one():
    """One proposal cannot count for two gt (the reference retires matched
    proposals, imdb.py:339-357) — a max-per-gt shortcut would report 1.0."""
    gt = np.asarray([[0, 0, 19, 19], [2, 2, 21, 21]], np.float32)
    roidb = [{"boxes": gt, "gt_classes": np.asarray([1, 1]),
              "iscrowd": np.zeros(2, bool)}]
    props = [np.asarray([[0, 0, 19, 19, 0.9]], np.float32)]
    rec = evaluate_recall(roidb, props, thresholds=[0.5])
    assert rec["areas"]["all"]["recalls"][0] == 0.5
