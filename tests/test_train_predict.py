"""End-to-end train-step + predictor smoke tests on a tiny model (1 CPU core budget),
including data-parallel sharding over the virtual 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from relation_tpu.config.defaults import default_config
from relation_tpu.core.trainer import (build_model, make_train_step,
                                       create_train_state, trainable_mask)
from relation_tpu.core.predictor import make_predict_fn
from relation_tpu.parallel.mesh import make_mesh, shard_batch, replicated


def tiny_cfg():
    cfg = default_config()
    cfg.symbol = "resnet_v1_101_rcnn_attention_1024_pairwise_position_multi_head_16_learn_nms"
    cfg.dataset.NUM_CLASSES = 5
    cfg.network.ANCHOR_SCALES = (2, 4)
    cfg.network.ANCHOR_RATIOS = (0.5, 1, 2)
    cfg.network.NUM_ANCHORS = 6
    cfg.network.NMS_TARGET_THRESH = "0.5, 0.7"
    cfg.TRAIN.LEARN_NMS = True
    cfg.TRAIN.BATCH_ROIS = -1
    cfg.TRAIN.ENABLE_OHEM = True
    cfg.TRAIN.BATCH_ROIS_OHEM = 16
    cfg.TRAIN.FIRST_N = 8
    cfg.TRAIN.RPN_PRE_NMS_TOP_N = 64
    cfg.TRAIN.RPN_POST_NMS_TOP_N = 24
    cfg.TRAIN.RPN_MIN_SIZE = 0
    cfg.TRAIN.BBOX_NORMALIZATION_PRECOMPUTED = True
    cfg.TRAIN.lr = 0.01
    cfg.TRAIN.lr_step = "5.33"
    cfg.TEST.LEARN_NMS = True
    cfg.TEST.FIRST_N = 8
    cfg.TEST.RPN_PRE_NMS_TOP_N = 64
    cfg.TEST.RPN_POST_NMS_TOP_N = 24
    cfg.TEST.RPN_MIN_SIZE = 0
    cfg.TEST.max_per_image = 10
    return cfg


def make_batch(rng, B, size=64, max_gt=4):
    imgs = rng.randn(B, size, size, 3).astype(np.float32)
    gt = np.zeros((B, max_gt, 5), np.float32)
    gv = np.zeros((B, max_gt), bool)
    for b in range(B):
        g = rng.randint(1, max_gt)
        for i in range(g):
            x1, y1 = rng.uniform(0, size / 2, 2)
            gt[b, i] = [x1, y1, x1 + rng.uniform(10, 25), y1 + rng.uniform(10, 25),
                        rng.randint(1, 5)]
        gv[b, :g] = True
    im_info = np.tile(np.array([[size, size, 1.0]], np.float32), (B, 1))
    return {"image": imgs, "im_info": im_info, "gt_boxes": gt, "gt_valid": gv}


def test_train_step_and_predict(rng):
    cfg = tiny_cfg()
    model = build_model(cfg, tiny=True)

    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               jnp.zeros((64, 64, 3)),
                               jnp.asarray([64.0, 64.0, 1.0]))
    step = make_train_step(model, cfg)

    batch = jax.tree.map(jnp.asarray, make_batch(rng, B=2))
    p0 = jax.tree.map(np.asarray, state.params)
    state2, metrics = jax.jit(step)(state, batch)
    metrics = jax.tree.map(float, metrics)
    for k, v in metrics.items():
        assert np.isfinite(v), (k, v)
    assert {"rpn_cls_loss", "rcnn_cls_loss", "nms_pos_loss",
            "nms_acc_neg"} <= set(metrics)

    # params moved, frozen params did not
    p1 = jax.tree.map(np.asarray, state2.params)
    mask = trainable_mask(state.params, cfg.network.FIXED_PARAMS)
    moved, frozen_same = [], []
    def chk(m, a, b):
        if m:
            moved.append(np.any(a != b))
        else:
            frozen_same.append(np.array_equal(a, b))
    jax.tree.map(chk, mask, p0, p1)
    assert any(moved), "no trainable param moved"
    assert all(frozen_same), "a frozen param moved"

    # second step runs from the new state (momentum path)
    state3, m3 = jax.jit(step)(state2, batch)
    assert np.isfinite(m3["total_loss"])

    # predictor on the trained params
    predict = make_predict_fn(model, cfg, feat_hw=(4, 4))
    out = predict(state3.params, batch["image"][0], batch["im_info"][0])
    dets = np.asarray(out["dets"])
    assert dets.shape == (10, 6)
    real = dets[:, 0] >= 0
    assert (dets[real, 1] >= 0).all()
    # scores descending among real rows
    assert np.all(np.diff(dets[real, 1]) <= 1e-6)


def assert_tree_allclose(a, b, rtol, atol, what=""):
    """Leaf-wise allclose over two pytrees with path-labelled failures."""
    from flax.traverse_util import flatten_dict
    fa, fb = flatten_dict(a), flatten_dict(b)
    assert fa.keys() == fb.keys()
    for path in fa:
        np.testing.assert_allclose(
            np.asarray(fa[path]), np.asarray(fb[path]), rtol=rtol, atol=atol,
            err_msg=f"{what} mismatch at {'/'.join(map(str, path))}")


def test_train_step_sharded_dp_parity(rng):
    """8-device data-parallel step == 1-device step on the SAME global batch.

    The numerical proof the reference's DP semantics demand (per-device grads
    summed by kvstore 'device' + rescale_grad=1/batch, reference
    core/module.py:473-518,479): updated params and metrics must match the
    unsharded run up to all-reduce reduction order. A wrong mean axis, a
    per-device-only mean, or a dropped psum shows up as an O(1) error here.
    """
    cfg = tiny_cfg()
    cfg.TRAIN.ENABLE_OHEM = False
    model = build_model(cfg, tiny=True)
    mesh = make_mesh(n_data=8)

    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               jnp.zeros((64, 64, 3)),
                               jnp.asarray([64.0, 64.0, 1.0]))
    step = make_train_step(model, cfg)
    host_batch = make_batch(rng, B=8)

    # (a) single-device reference run on the full global batch
    ref_state, ref_metrics = jax.jit(step)(
        state, jax.tree.map(jnp.asarray, host_batch))
    ref_params = jax.tree.map(np.asarray, ref_state.params)
    ref_metrics = jax.tree.map(float, ref_metrics)
    assert np.isfinite(ref_metrics["total_loss"])

    # (b) the same step, batch sharded over 8 devices, params replicated
    batch = shard_batch(mesh, host_batch)
    sstate = jax.device_put(state, replicated(mesh))
    with mesh:
        state2, metrics = jax.jit(step)(sstate, batch)
    # gradients were all-reduced: params identical on all devices (replicated)
    leaf = jax.tree.leaves(state2.params)[0]
    assert len(leaf.sharding.device_set) == 8

    # tolerance covers reduction order only (f32 tiny model)
    assert_tree_allclose(ref_params, jax.tree.map(np.asarray, state2.params),
                         rtol=1e-4, atol=1e-6, what="params")
    for k, v in jax.tree.map(float, metrics).items():
        np.testing.assert_allclose(v, ref_metrics[k], rtol=1e-4, atol=1e-6,
                                   err_msg=f"metric {k}")
    # and the update actually moved something (guards a vacuous pass)
    moved = jax.tree.map(lambda a, b: np.any(np.asarray(a) != np.asarray(b)),
                         state.params, state2.params)
    assert any(jax.tree.leaves(moved))


def test_classic_predict_softnms(rng):
    cfg = tiny_cfg()
    cfg.TEST.LEARN_NMS = False
    cfg.TRAIN.LEARN_NMS = False
    cfg.TEST.SOFTNMS = True
    cfg.TEST.NMS = 0.6
    cfg.symbol = "resnet_v1_101_rcnn"
    model = build_model(cfg, tiny=True)
    img = jnp.asarray(rng.randn(64, 64, 3).astype(np.float32))
    sample_rois = jnp.zeros((8, 4)) + jnp.asarray([0, 0, 16, 16.0])
    params = model.init(jax.random.PRNGKey(0), img, sample_rois,
                        jnp.asarray([64.0, 64.0, 1.0]), 8)["params"]
    predict = make_predict_fn(model, cfg, feat_hw=(4, 4))
    out = predict(params, img, jnp.asarray([64.0, 64.0, 1.0]))
    assert np.asarray(out["dets"]).shape == (10, 6)


def test_pred_eval_sharded_matches_sequential(rng, tmp_path):
    """Data-parallel evaluation (one image per device over the 8-CPU mesh)
    yields detections identical to the sequential per-image path — the
    reference's multi-GPU Predictor + _merge_multi_context merge
    (core/tester.py:27-40, DataParallelExecutorGroup.py:47-60). Mixed buckets
    and a partial final batch (4+2 images over 8 devices) are exercised."""
    import json
    from relation_tpu.core.evaluator import pred_eval
    from relation_tpu.data.coco import CocoDataset

    cfg = tiny_cfg()
    model = build_model(cfg, tiny=True)
    img0 = jnp.asarray(rng.randn(64, 64, 3).astype(np.float32))
    sample_rois = jnp.zeros((9, 4)) + jnp.asarray([0, 0, 16, 16.0])
    params = model.init(jax.random.PRNGKey(0), img0, sample_rois,
                        jnp.asarray([64.0, 64.0, 1.0]), 9)["params"]

    # minimal COCO dataset (ids only; images come from the fake loader)
    images = [{"id": i + 1, "file_name": f"im{i}.jpg",
               "height": 64, "width": 64} for i in range(6)]
    anns = [{"id": i + 1, "image_id": i + 1, "category_id": 1,
             "bbox": [8.0, 8.0, 20.0, 20.0], "area": 400.0, "iscrowd": 0}
            for i in range(6)]
    p = tmp_path / "ann.json"
    p.write_text(json.dumps({"images": images, "annotations": anns,
                             "categories": [{"id": 1, "name": "thing"}]}))
    ds = CocoDataset(str(p))

    # two buckets: 4 images at 64x64, 2 at 48x64 (both partial vs n_dev=8)
    items = []
    for i in range(6):
        h = 64 if i < 4 else 48
        img = rng.randn(h, 64, 3).astype(np.float32)
        items.append((i + 1, img, np.asarray([h, 64, 1.0], np.float32)))

    class L:
        def __iter__(self):
            return iter(items)

        def __len__(self):
            return len(items)

    _, seq = pred_eval(model, params, cfg, ds, None, loader=L())
    mesh = make_mesh(n_data=8)
    _, par = pred_eval(model, params, cfg, ds, None, loader=L(), mesh=mesh)
    assert set(seq) == set(par) == {1, 2, 3, 4, 5, 6}
    for k in seq:
        np.testing.assert_array_equal(
            par[k], seq[k], err_msg=f"image {k}: sharded != sequential")
    assert any(len(v) for v in seq.values())


def test_prewarm_buckets_populates_shared_cache(rng):
    """prewarm_buckets compiles one predict fn per configured bucket from
    parallel threads into the SAME dict pred_eval consults (the multi-bucket
    cold-start fix: 77.7 s serial -> 45.6 s threaded on the TPU,
    tools/bench_prewarm.py); a prewarmed fn must be the one the lazy path
    would have built — detections identical."""
    from relation_tpu.core.evaluator import prewarm_buckets, _build_predict_fn

    cfg = tiny_cfg()
    cfg.TEST.LEARN_NMS = False
    cfg.TRAIN.LEARN_NMS = False
    cfg.symbol = "resnet_v1_101_rcnn"
    cfg.TPU.S2D_INPUT = False
    cfg.TPU.H2D_UINT8 = False
    cfg.TPU.IMAGE_BUCKETS = [(48, 64), (64, 64)]
    model = build_model(cfg, tiny=True)
    img0 = jnp.asarray(rng.randn(64, 64, 3).astype(np.float32))
    sample_rois = jnp.zeros((8, 4)) + jnp.asarray([0, 0, 16, 16.0])
    params = model.init(jax.random.PRNGKey(0), img0, sample_rois,
                        jnp.asarray([64.0, 64.0, 1.0]), 8)["params"]

    predict_fns = {}
    prewarm_buckets(model, params, cfg, predict_fns, block=True)
    stride = int(cfg.network.RCNN_FEAT_STRIDE)
    want = {(h // stride, w // stride) for h, w in cfg.TPU.IMAGE_BUCKETS}
    assert set(predict_fns) == want

    info = jnp.asarray([64.0, 64.0, 1.0])
    out_warm = predict_fns[(4, 4)](params, img0, info, None)
    out_lazy = _build_predict_fn(model, cfg, (4, 4))(params, img0, info, None)
    np.testing.assert_array_equal(np.asarray(out_warm["dets"]),
                                  np.asarray(out_lazy["dets"]))
