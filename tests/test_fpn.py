"""FPN detector tests: neck shapes, ROI dispatch formula, tiny end-to-end train +
predict through the generic trainer/predictor."""

import numpy as np
import jax
import jax.numpy as jnp

from relation_tpu.models.fpn import (RelationRCNNFPN, roi_level_dispatch,
                                     fpn_anchors, FPN_STRIDES)
from relation_tpu.core.trainer import (build_model, create_train_state,
                                       make_train_step)
from relation_tpu.core.predictor import make_predict_fn
from tests.test_train_predict import tiny_cfg, make_batch


def test_roi_level_dispatch():
    # reference formula clip(floor(2 + log2(sqrt(wh)/224)), 0, 3) (core/rcnn.py:55)
    rois = jnp.asarray([
        [0, 0, 15, 15],       # sqrt(256)=16 -> floor(2+log2(16/224)) = -1 -> 0
        [0, 0, 111, 111],     # 112 -> floor(2-1)=1
        [0, 0, 223, 223],     # 224 -> 2
        [0, 0, 447, 447],     # 448 -> 3
        [0, 0, 1000, 1000],   # clipped to 3
    ], dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(roi_level_dispatch(rois)),
                                  [0, 1, 2, 3, 3])


def fpn_tiny_cfg():
    cfg = tiny_cfg()
    cfg.symbol = "resnet_v1_101_rcnn_fpn_attention_1024_pairwise_position_multi_head_16_learn_nms"
    return cfg


def test_fpn_forward_and_anchors(rng):
    cfg = fpn_tiny_cfg()
    model = build_model(cfg, tiny=True)
    assert isinstance(model, RelationRCNNFPN)
    img = jnp.asarray(rng.randn(64, 64, 3).astype(np.float32))
    rois = jnp.asarray(np.stack([np.zeros(10), np.zeros(10), np.full(10, 20.0),
                                 np.full(10, 20.0)], 1).astype(np.float32))
    im_info = jnp.asarray([64.0, 64.0, 1.0])
    params = model.init(jax.random.PRNGKey(0), img, rois, im_info, 9)
    out = model.apply(params, img, rois, im_info, 9)
    assert out["cls_score"].shape == (10, 5)
    assert set(out["rpn"].keys()) == set(FPN_STRIDES)
    # stride-4 level has 16x16 cells for a 64px image
    assert out["rpn"][4][0].shape[:2] == (16, 16)
    assert out["rpn"][64][0].shape[:2] == (1, 1)

    anchors = fpn_anchors({s: out["rpn"][s][0].shape[:2] for s in FPN_STRIDES},
                          (2, 4), (0.5, 1, 2))
    assert anchors[4].shape == (16 * 16 * 6, 4)
    assert anchors[64].shape == (6, 4)


def test_fpn_train_and_predict(rng):
    cfg = fpn_tiny_cfg()
    model = build_model(cfg, tiny=True)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               jnp.zeros((64, 64, 3)),
                               jnp.asarray([64.0, 64.0, 1.0]))
    step = make_train_step(model, cfg)
    batch = jax.tree.map(jnp.asarray, make_batch(rng, B=2))
    state2, metrics = jax.jit(step)(state, batch)
    for k, v in jax.tree.map(float, metrics).items():
        assert np.isfinite(v), (k, v)

    predict = make_predict_fn(model, cfg, feat_hw=(4, 4))
    out = predict(state2.params, batch["image"][0], batch["im_info"][0])
    assert np.asarray(out["dets"]).shape == (10, 6)


def test_fpn_split_predict_matches_single_module(rng):
    """TPU.FPN_SPLIT_PREDICT two-dispatch inference (XLA-only stage 1 |
    Pallas-tail stage 2) returns the same detections as the single-module
    predict. Boxes/classes must match exactly; scores to float tolerance
    (the Pallas geometry-bias tail tiles its einsums differently)."""
    from relation_tpu.core.predictor import make_predict_fn_split
    cfg = fpn_tiny_cfg()
    model = build_model(cfg, tiny=True)
    img = jnp.asarray((rng.randn(64, 64, 3) * 40).astype(np.float32))
    rois0 = jnp.tile(jnp.asarray([[0.0, 0.0, 16.0, 16.0]]), (9, 1))
    im_info = jnp.asarray([64.0, 64.0, 1.0])
    params = model.init(jax.random.PRNGKey(0), img, rois0, im_info, 9)["params"]

    ref = make_predict_fn(model, cfg, feat_hw=(4, 4))(params, img, im_info)
    got = make_predict_fn_split(model, cfg, feat_hw=(4, 4))(params, img,
                                                            im_info)
    d_ref, d_got = np.asarray(ref["dets"]), np.asarray(got["dets"])
    np.testing.assert_array_equal(d_got[:, 0], d_ref[:, 0])      # class ids
    np.testing.assert_allclose(d_got[:, 1], d_ref[:, 1], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(d_got[:, 2:], d_ref[:, 2:], rtol=1e-4,
                               atol=1e-4)
    assert (d_ref[:, 0] >= 0).any()


def test_fpn_split3_predict_matches_single_module(rng):
    """TPU.FPN_SPLIT_PREDICT=3 three-dispatch inference (convs | proposal
    decode+NMS | Pallas head+tail) returns the same detections as the
    single-module predict (on CPU the stage-2 sweep falls back to the
    while-loop form, which is the exact same greedy fixpoint)."""
    from relation_tpu.core.predictor import make_predict_fn_split3
    cfg = fpn_tiny_cfg()
    model = build_model(cfg, tiny=True)
    img = jnp.asarray((rng.randn(64, 64, 3) * 40).astype(np.float32))
    rois0 = jnp.tile(jnp.asarray([[0.0, 0.0, 16.0, 16.0]]), (9, 1))
    im_info = jnp.asarray([64.0, 64.0, 1.0])
    params = model.init(jax.random.PRNGKey(0), img, rois0, im_info, 9)["params"]

    ref = make_predict_fn(model, cfg, feat_hw=(4, 4))(params, img, im_info)
    got = make_predict_fn_split3(model, cfg, feat_hw=(4, 4))(params, img,
                                                             im_info)
    d_ref, d_got = np.asarray(ref["dets"]), np.asarray(got["dets"])
    np.testing.assert_array_equal(d_got[:, 0], d_ref[:, 0])      # class ids
    np.testing.assert_allclose(d_got[:, 1], d_ref[:, 1], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(d_got[:, 2:], d_ref[:, 2:], rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["rois"]),
                               np.asarray(ref["rois"]), rtol=1e-5, atol=1e-4)
    assert (d_ref[:, 0] >= 0).any()
