"""Model-layer tests: relation attention math vs a NumPy oracle, learned-NMS head
shapes/semantics, tiny end-to-end detector forward."""

import numpy as np
import jax
import jax.numpy as jnp

from relation_tpu.models.relation import RelationModule
from relation_tpu.models.learn_nms import LearnNMSHead, merge_multi_score
from relation_tpu.models.detector import RelationRCNN
from relation_tpu.ops.embeddings import (extract_position_matrix,
                                         extract_position_embedding)


def np_sinusoid_emb(pos, wave_length=1000.0):
    """Reference sinusoid (4 fields x 8 freqs, sin||cos per field): [.., 4] -> [.., 64]."""
    k = np.arange(8)
    lam = np.power(wave_length, (8.0 / 64.0) * k)
    div = (100.0 * pos)[..., None] / lam                      # [..., 4, 8]
    emb = np.concatenate([np.sin(div), np.cos(div)], axis=-1)  # [..., 4, 16]
    return emb.reshape(pos.shape[:-1] + (64,))


def np_relation_oracle(params, roi_feat, pos_mat, groups, dim_qk):
    """NumPy re-derivation of the relation formula (weighted_aff = log(max(wg,1e-6))
    + QK^T/sqrt(d)) for an independent check. pos_mat: [N, K, 4]."""
    n, k = roi_feat.shape[0], pos_mat.shape[1]
    p = params
    pos_emb = np_sinusoid_emb(pos_mat)
    wg = pos_emb @ p["pair_pos_fc1_1"]["kernel"] + p["pair_pos_fc1_1"]["bias"]
    q = roi_feat @ p["query_1"]["kernel"] + p["query_1"]["bias"]
    kk = roi_feat[:k] @ p["key_1"]["kernel"] + p["key_1"]["bias"]
    dg = dim_qk // groups
    q = q.reshape(n, groups, dg)
    kk = kk.reshape(k, groups, dg)
    aff = np.einsum("ngd,kgd->ngk", q, kk) / np.sqrt(dg)
    weighted = aff + np.transpose(np.log(np.maximum(wg, 1e-6)), (0, 2, 1))
    e = np.exp(weighted - weighted.max(axis=-1, keepdims=True))
    attn = e / e.sum(axis=-1, keepdims=True)
    out = np.einsum("ngk,kf->ngf", attn, roi_feat[:k])
    w = p["linear_out_1_weight"]
    b = p["linear_out_1_bias"]
    return np.einsum("ngf,gfe->nge", out, w).reshape(n, -1) + b


def test_relation_module_matches_oracle(rng):
    n, k, feat, groups = 12, 8, 32, 4
    mod = RelationModule(index=1, groups=groups, dim_qk=32, dim_out=32)
    roi_feat = jnp.asarray(rng.randn(n, feat).astype(np.float32))
    pos_mat = rng.randn(n, k, 4).astype(np.float32)
    pos_t = jnp.asarray(np.transpose(pos_mat, (2, 0, 1)))
    params = mod.init(jax.random.PRNGKey(0), roi_feat, pos_t)["params"]
    got = np.asarray(mod.apply({"params": params}, roi_feat, pos_t))
    p_np = jax.tree.map(np.asarray, params)
    want = np_relation_oracle(p_np, np.asarray(roi_feat), pos_mat, groups, 32)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_position_embedding_shapes(rng):
    rois = jnp.asarray(rng.uniform(0, 100, (10, 4)).astype(np.float32))
    rois = rois.at[:, 2:].set(rois[:, :2] + 10)
    pm = extract_position_matrix(rois, nongt_dim=6)
    assert pm.shape == (10, 6, 4)
    emb = extract_position_embedding(pm, 64)
    assert emb.shape == (10, 6, 64)
    # diagonal geometry: dx=dy=log(1e-3), dw=dh=0
    np.testing.assert_allclose(np.asarray(pm)[0, 0, 0], np.log(1e-3), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pm)[0, 0, 2], 0.0, atol=1e-6)


def test_learn_nms_head(rng):
    n, num_classes, first_n, num_thresh = 24, 5, 8, 3
    head = LearnNMSHead(num_fg_classes=num_classes - 1, first_n=first_n,
                        num_thresh=num_thresh)
    cls_score = jnp.asarray(rng.randn(n, num_classes).astype(np.float32))
    bbox_pred = jnp.asarray(rng.randn(n, 8).astype(np.float32) * 0.1)
    x1 = rng.uniform(0, 80, (n,))
    y1 = rng.uniform(0, 80, (n,))
    rois = jnp.asarray(np.stack([x1, y1, x1 + 20, y1 + 20], 1).astype(np.float32))
    roi_feat = jnp.asarray(rng.randn(n, 16).astype(np.float32))
    im_info = jnp.asarray([100.0, 100.0, 1.0])

    params = head.init(jax.random.PRNGKey(1), cls_score, bbox_pred, rois,
                       roi_feat, im_info)
    out = head.apply(params, cls_score, bbox_pred, rois, roi_feat, im_info)
    assert out["nms_multi_score"].shape == (first_n, num_classes - 1, num_thresh)
    assert out["sorted_bbox"].shape == (first_n, num_classes - 1, 4)
    # sorted_score descending per class and equal to sorted softmax probs
    ss = np.asarray(out["sorted_score"])
    assert np.all(np.diff(ss, axis=0) <= 1e-6)
    probs = np.asarray(jax.nn.softmax(cls_score, -1))[:, 1:]
    np.testing.assert_allclose(ss, -np.sort(-probs, axis=0)[:first_n], rtol=1e-5)
    # conditional score near sigmoid(-3) at init (logit bias -3, small weights)
    cond = np.asarray(out["nms_conditional_score"])
    assert abs(cond.mean() - 1.0 / (1 + np.exp(3.0))) < 0.02
    # multi_score = sorted_score * conditional
    np.testing.assert_allclose(np.asarray(out["nms_multi_score"]),
                               ss[..., None] * cond, rtol=1e-5)
    # merge methods
    m = merge_multi_score(out["nms_multi_score"], -1)
    assert m.shape == (first_n, num_classes - 1)
    m2 = merge_multi_score(out["nms_multi_score"], 1)
    np.testing.assert_allclose(np.asarray(m2),
                               np.asarray(out["nms_multi_score"])[:, :, 1])


def test_detector_tiny_forward(rng):
    model = RelationRCNN(num_classes=5, num_anchors=3, backbone="tiny",
                         head_dim=64, use_relation=True, use_learn_nms=True,
                         first_n=8, num_thresh=3, conv_dtype=jnp.float32)
    img = jnp.asarray(rng.randn(64, 64, 3).astype(np.float32))
    n_rois = 16
    x1 = rng.uniform(0, 40, (n_rois,))
    y1 = rng.uniform(0, 40, (n_rois,))
    rois = jnp.asarray(np.stack([x1, y1, x1 + 20, y1 + 20], 1).astype(np.float32))
    im_info = jnp.asarray([64.0, 64.0, 1.0])
    params = model.init(jax.random.PRNGKey(0), img, rois, im_info, 12)
    out = model.apply(params, img, rois, im_info, 12)
    assert out["rpn_cls"].shape == (4, 4, 3, 2)
    assert out["rpn_bbox"].shape == (4, 4, 3, 4)
    assert out["cls_score"].shape == (n_rois, 5)
    assert out["bbox_pred"].shape == (n_rois, 8)
    assert out["nms_multi_score"].shape == (8, 4, 3)


def test_s2d_stem_matches_nhwc_stem(rng):
    """The space-to-depth planar stem must match the NHWC 7x7 stem exactly
    (same conv1/bn_conv1 params, f32): conv1 -> bn -> relu -> maxpool -> res2a..
    Dispatch is static on input shape (models/backbone.py::ResNet101C4)."""
    from relation_tpu.models.backbone import ResNet101C4, image_to_s2d_planar

    model = ResNet101C4(dtype=jnp.float32, out_stages=(2,))
    img = rng.randn(32, 64, 3).astype(np.float32) * 10
    x_nhwc = jnp.asarray(img[None])
    x_s2d = jnp.asarray(image_to_s2d_planar(img)[None])
    params = model.init(jax.random.PRNGKey(0), x_nhwc)["params"]

    a = model.apply({"params": params}, x_nhwc)[2]
    b = model.apply({"params": params}, x_s2d)[2]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-4, atol=2e-4)


def test_to_s2d_planar_roundtrip(rng):
    from relation_tpu.data.image import to_s2d_planar
    img = rng.randn(8, 12, 3).astype(np.float32)
    s2d = to_s2d_planar(img)
    assert s2d.shape == (12, 4, 6)
    # channel order (pi, pj, c): block (pi, pj) holds img[pi::2, pj::2, c]
    for pi in range(2):
        for pj in range(2):
            for c in range(3):
                np.testing.assert_array_equal(s2d[pi * 6 + pj * 3 + c],
                                              img[pi::2, pj::2, c])


def test_learn_nms_class_thresh_zeroes_inactive(rng):
    """Inference-time valid-class filter (reference learn_nms.py:296-309 +
    TEST.LEARN_NMS_CLASS_SCORE_TH): classes whose best sorted score is below
    min(thresh, global best) get conditional score exactly 0; active classes
    are untouched; training mode (thresh=0) computes every class."""
    C, F, T, N = 4, 6, 3, 16
    head = LearnNMSHead(num_fg_classes=C, first_n=F, num_thresh=T,
                        class_agnostic=True)
    cls_score = jnp.asarray(rng.randn(N, C + 1).astype(np.float32) * 2)
    bbox = jnp.asarray(rng.randn(N, 8).astype(np.float32) * 0.1)
    rois = jnp.asarray(np.abs(rng.randn(N, 4)).astype(np.float32) * 50)
    rois = rois.at[:, 2:].set(rois[:, 2:] + rois[:, :2] + 10)
    feat = jnp.asarray(rng.randn(N, 32).astype(np.float32))
    im_info = jnp.asarray([200.0, 300.0, 1.0])
    params = head.init(jax.random.PRNGKey(0), cls_score, bbox, rois, feat,
                       im_info)["params"]

    out0 = head.apply({"params": params}, cls_score, bbox, rois, feat, im_info)
    thresh = 0.3
    out1 = head.apply({"params": params}, cls_score, bbox, rois, feat, im_info,
                      class_thresh=thresh)
    mx = np.asarray(out0["sorted_score"]).max(axis=0)
    thr = min(thresh, mx.max())
    active = mx >= thr
    assert active.any()
    c0 = np.asarray(out0["nms_conditional_score"])
    c1 = np.asarray(out1["nms_conditional_score"])
    np.testing.assert_array_equal(c1[:, ~active], 0.0)
    np.testing.assert_allclose(c1[:, active], c0[:, active], rtol=1e-6)


def test_learn_nms_xla_compact_class_path(rng):
    """XLA class-gather compact path (models/relation.py compact_classes, the
    FPN analogue of the Pallas skip kernel; reference learn_nms.py:296-309):
    with <= m active classes the attention runs on a gathered [m, ...] batch —
    active classes' scores must match the dense XLA path exactly and inactive
    classes stay zero. With > m active, the lax.cond falls back to dense."""
    C, F, T, N = 6, 6, 3, 16
    kw = dict(num_fg_classes=C, first_n=F, num_thresh=T, class_agnostic=True,
              allow_pallas=False)
    dense = LearnNMSHead(compact_classes=0, **kw)
    compact = LearnNMSHead(compact_classes=3, **kw)
    cls_score = jnp.asarray(rng.randn(N, C + 1).astype(np.float32) * 2)
    bbox = jnp.asarray(rng.randn(N, 8).astype(np.float32) * 0.1)
    rois = jnp.asarray(np.abs(rng.randn(N, 4)).astype(np.float32) * 50)
    rois = rois.at[:, 2:].set(rois[:, 2:] + rois[:, :2] + 10)
    feat = jnp.asarray(rng.randn(N, 32).astype(np.float32))
    im_info = jnp.asarray([200.0, 300.0, 1.0])
    params = dense.init(jax.random.PRNGKey(0), cls_score, bbox, rois, feat,
                        im_info)["params"]

    # pick a thresh that keeps <= 3 classes active
    probe = dense.apply({"params": params}, cls_score, bbox, rois, feat,
                        im_info)
    mx = np.sort(np.asarray(probe["sorted_score"]).max(axis=0))[::-1]
    thresh = float((mx[1] + mx[2]) / 2)          # exactly 2 active classes
    args = (cls_score, bbox, rois, feat, im_info)
    out_d = dense.apply({"params": params}, *args, class_thresh=thresh)
    out_c = jax.jit(lambda p, *a: compact.apply({"params": p}, *a,
                                                class_thresh=thresh))(
        params, *args)
    cd = np.asarray(out_d["nms_conditional_score"])
    cc = np.asarray(out_c["nms_conditional_score"])
    active = np.asarray(probe["sorted_score"]).max(axis=0) >= min(
        thresh, mx[0])
    assert active.sum() == 2
    np.testing.assert_array_equal(cc[:, ~active], 0.0)
    np.testing.assert_allclose(cc[:, active], cd[:, active], rtol=2e-5,
                               atol=1e-7)

    # > m active classes: falls back to dense (all classes above thresh)
    out_f = jax.jit(lambda p, *a: compact.apply({"params": p}, *a,
                                                class_thresh=1e-9))(
        params, *args)
    out_fd = dense.apply({"params": params}, *args, class_thresh=1e-9)
    np.testing.assert_allclose(np.asarray(out_f["nms_conditional_score"]),
                               np.asarray(out_fd["nms_conditional_score"]),
                               rtol=2e-5, atol=1e-7)


def test_geom_bias_bf16_emb_attention_bound(rng):
    """TPU.GEOM_EMB_DTYPE=bfloat16 (the FPN dense-path HBM saver): the log-bias
    may differ near the 1e-6 clamp (both sides mean "pair suppressed"), but the
    POST-SOFTMAX attention — the quantity that reaches the head — must stay
    within a tight bound of the f32 sinusoid path (measured 0.0086 max at
    C=8, N=64; asserted at 0.05)."""
    import jax
    import jax.numpy as jnp
    from relation_tpu.ops.pallas.geom_bias import geom_bias_reference

    pos = rng.uniform(-4, 4, (4, 4, 32, 32)).astype(np.float32)
    W = (rng.randn(64, 16) * 0.01).astype(np.float32)
    b = np.zeros(16, np.float32)
    b32 = geom_bias_reference(jnp.asarray(pos), jnp.asarray(W), jnp.asarray(b))
    b16 = geom_bias_reference(jnp.asarray(pos), jnp.asarray(W), jnp.asarray(b),
                              emb_dtype=jnp.bfloat16)
    aff = jnp.asarray(rng.randn(4, 16, 32, 32).astype(np.float32))
    a32 = np.asarray(jax.nn.softmax(aff + b32, axis=-1))
    a16 = np.asarray(jax.nn.softmax(aff + b16, axis=-1))
    assert np.abs(a32 - a16).max() < 0.05
