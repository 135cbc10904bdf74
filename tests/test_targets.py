"""On-device target-assignment ops vs NumPy oracles of the reference semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from relation_tpu.models.targets import (anchor_targets, sample_rois, ohem_select,
                                         nms_multi_target, expand_bbox_targets)
from tests.reference_impls import np_bbox_overlaps, np_bbox_transform


def make_gt(rng, g_real, max_g, num_classes=5, size=200):
    gt = np.zeros((max_g, 5), dtype=np.float32)
    x1 = rng.uniform(0, size - 60, g_real)
    y1 = rng.uniform(0, size - 60, g_real)
    w = rng.uniform(20, 60, g_real)
    h = rng.uniform(20, 60, g_real)
    gt[:g_real, 0] = x1
    gt[:g_real, 1] = y1
    gt[:g_real, 2] = x1 + w
    gt[:g_real, 3] = y1 + h
    gt[:g_real, 4] = rng.randint(1, num_classes, g_real)
    valid = np.zeros(max_g, dtype=bool)
    valid[:g_real] = True
    return gt, valid


def np_assign_anchor_labels(anchors, gt, im_info, pos_ov=0.7, neg_ov=0.3):
    """Pre-subsample label assignment (reference lib/rpn/rpn.py:144-186)."""
    inside = ((anchors[:, 0] >= 0) & (anchors[:, 1] >= 0) &
              (anchors[:, 2] < im_info[1]) & (anchors[:, 3] < im_info[0]))
    labels = np.full(len(anchors), -1.0)
    idx = np.where(inside)[0]
    if len(gt) > 0:
        ov = np_bbox_overlaps(anchors[idx], gt[:, :4])
        mx = ov.max(axis=1)
        in_labels = np.full(len(idx), -1.0)
        in_labels[mx < neg_ov] = 0
        gt_max = ov.max(axis=0)
        gt_best = np.where(ov == gt_max[None, :])[0]
        in_labels[gt_best] = 1
        in_labels[mx >= pos_ov] = 1
        labels[idx] = in_labels
    else:
        labels[idx] = 0
    return labels


def test_anchor_targets_labels_match_oracle(rng):
    n_anchor = 120
    x1 = rng.uniform(-20, 180, n_anchor)
    y1 = rng.uniform(-20, 180, n_anchor)
    w = rng.uniform(10, 80, n_anchor)
    anchors = np.stack([x1, y1, x1 + w, y1 + w], 1).astype(np.float32)
    gt, valid = make_gt(rng, 4, 8)
    im_info = np.array([200.0, 200.0, 1.0], np.float32)

    # huge batch size -> no subsampling -> exact label parity
    label, target, weight = anchor_targets(
        jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(valid),
        jnp.asarray(im_info), jax.random.PRNGKey(0), rpn_batch_size=10000)
    label = np.asarray(label)
    want = np_assign_anchor_labels(anchors.astype(np.float64), gt[:4].astype(np.float64),
                                   im_info)
    np.testing.assert_array_equal(label, want.astype(np.int32))

    # fg targets equal bbox_transform to the argmax gt
    target = np.asarray(target)
    ov = np_bbox_overlaps(anchors.astype(np.float64), gt[:4, :4].astype(np.float64))
    amax = ov.argmax(axis=1)
    fg = np.where(label == 1)[0]
    want_t = np_bbox_transform(anchors[fg], gt[amax[fg], :4])
    np.testing.assert_allclose(target[fg], want_t, rtol=1e-3, atol=1e-3)
    # weights only on fg
    wsum = np.asarray(weight).sum(axis=1)
    assert (wsum[label == 1] > 0).all() and (wsum[label != 1] == 0).all()


def test_anchor_targets_subsampling(rng):
    # dense overlapping anchors around one gt -> many fg; check caps
    base = np.array([50, 50, 110, 110], np.float32)
    jit = rng.uniform(-4, 4, (600, 4)).astype(np.float32)
    anchors = base[None, :] + jit
    gt, valid = make_gt(rng, 1, 4)
    gt[0] = [50, 50, 110, 110, 1]
    label, _, _ = anchor_targets(
        jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(valid),
        jnp.asarray([200.0, 200.0, 1.0]), jax.random.PRNGKey(1),
        rpn_batch_size=64, fg_fraction=0.5)
    label = np.asarray(label)
    assert (label == 1).sum() == 32          # fg capped at 32
    assert (label == 0).sum() <= 32          # bg fills the rest
    assert (label == 1).sum() + (label == 0).sum() <= 64


def test_sample_rois_take_all(rng):
    R = 20
    x1 = rng.uniform(0, 140, R)
    y1 = rng.uniform(0, 140, R)
    rois = np.stack([x1, y1, x1 + 40, y1 + 40], 1).astype(np.float32)
    gt, valid = make_gt(rng, 3, 6)
    out = sample_rois(jnp.asarray(rois), jnp.ones(R, bool), jnp.asarray(gt),
                      jnp.asarray(valid), jax.random.PRNGKey(0),
                      batch_rois=-1, num_reg_classes=2)
    assert out["rois"].shape == (R + 6, 4)
    label = np.asarray(out["label"])
    # appended real gt rois must be fg with their own class
    np.testing.assert_array_equal(label[R:R + 3], gt[:3, 4].astype(np.int32))
    # padded gt rows ignored
    assert (label[R + 3:] == -1).all()
    # oracle labels for proposals
    ov = np_bbox_overlaps(rois.astype(np.float64), gt[:3, :4].astype(np.float64))
    mx, amax = ov.max(1), ov.argmax(1)
    want = np.where(mx >= 0.5, gt[amax, 4], 0).astype(np.int32)
    np.testing.assert_array_equal(label[:R], want)
    # bbox targets: fg rows one-hot in group 1 (class-agnostic)
    bt = np.asarray(out["bbox_target"]).reshape(R + 6, 2, 4)
    bw = np.asarray(out["bbox_weight"]).reshape(R + 6, 2, 4)
    fg = label > 0
    assert (bw[fg, 1] == 1).all() and (bw[fg, 0] == 0).all()
    assert (bw[~fg] == 0).all()
    want_t = np_bbox_transform(rois, gt[amax, :4])
    np.testing.assert_allclose(bt[:R][fg[:R], 1], want_t[fg[:R]], rtol=1e-3, atol=1e-3)


def test_sample_rois_fixed_batch(rng):
    R = 40
    gt, valid = make_gt(rng, 2, 4)
    # half the rois on gt0 (fg), half far away (bg)
    fgs = gt[0, :4] + rng.uniform(-2, 2, (R // 2, 4))
    bgs = np.stack([rng.uniform(150, 160, R // 2)] * 4, 1) + [[0, 0, 20, 20]]
    rois = np.concatenate([fgs, bgs]).astype(np.float32)
    out = sample_rois(jnp.asarray(rois), jnp.ones(R, bool), jnp.asarray(gt),
                      jnp.asarray(valid), jax.random.PRNGKey(2),
                      batch_rois=16, num_reg_classes=2, fg_fraction=0.25)
    label = np.asarray(out["label"])
    assert label.shape == (16,)
    assert (label > 0).sum() == 4            # fg capped at fg_fraction * batch
    assert (label == 0).sum() == 12
    assert out["rois"].shape == (16, 4)


def test_ohem_select(rng):
    R, C = 30, 5
    cls = jnp.asarray(rng.randn(R, C).astype(np.float32))
    bbox = jnp.asarray(rng.randn(R, 8).astype(np.float32))
    bt = jnp.asarray(rng.randn(R, 8).astype(np.float32))
    bw = jnp.asarray((rng.rand(R, 8) > 0.5).astype(np.float32))
    label = jnp.asarray(rng.randint(0, C, R).astype(np.int32))
    label = label.at[:5].set(-1)
    lo, wo = ohem_select(cls, bbox, label, bt, bw, roi_per_img=10)
    lo = np.asarray(lo)
    assert (lo >= 0).sum() == 10
    assert (lo[:5] == -1).all()                      # ignored rows never kept
    assert (np.asarray(wo)[lo == -1] == 0).all()


def np_nms_multi_target(bbox, gt, score, threshes):
    """Oracle port of operator_py/nms_multi_target.py:39-73 semantics."""
    F, C, _ = bbox.shape
    out = np.zeros((F, C, len(threshes)), np.float32)
    for c in range(C):
        vmask = gt[:, 4].astype(int) == c + 1
        vgt = gt[vmask]
        if len(vgt) == 0:
            continue
        ov = np_bbox_overlaps(bbox[:, c, :].astype(np.float64),
                              vgt[:, :4].astype(np.float64))
        eye = np.eye(len(vgt))
        for ti, t in enumerate(threshes):
            m = ov > t
            valid_rows = np.where(m)[0]
            osc = np.tile(score[:, c:c + 1], (1, len(vgt))) * m
            osc *= eye[ov.argmax(axis=1)]
            winners = osc.argmax(axis=0)
            out[np.intersect1d(winners, valid_rows), c, ti] = 1
    return out


def test_nms_multi_target_matches_oracle(rng):
    F, C, G = 12, 3, 6
    gt, valid = make_gt(rng, 4, G, num_classes=C + 1)
    x1 = rng.uniform(0, 150, (F, C))
    y1 = rng.uniform(0, 150, (F, C))
    w = rng.uniform(15, 70, (F, C))
    bbox = np.stack([x1, y1, x1 + w, y1 + w], -1).astype(np.float32)
    # make some boxes near gts so targets fire
    for i in range(4):
        bbox[i, int(gt[i, 4]) - 1] = gt[i, :4] + rng.uniform(-3, 3, 4)
    score = rng.uniform(0, 1, (F, C)).astype(np.float32)
    threshes = (0.5, 0.7)
    got = np.asarray(nms_multi_target(jnp.asarray(bbox), jnp.asarray(gt),
                                      jnp.asarray(valid), jnp.asarray(score),
                                      threshes))
    want = np_nms_multi_target(bbox, gt[:4], score, threshes)
    np.testing.assert_array_equal(got, want)
    assert want.sum() > 0                      # the test actually fired targets


def np_sample_rois_oracle(rois, gt, batch_rois, fg_fraction, fg_thresh,
                          bg_hi, bg_lo, rng):
    """Reference sample_rois distribution (core/rcnn.py:329-383): fg/bg draw
    without replacement, then gap rows drawn uniformly from ALL rois (repeats
    of selected rois possible), labels by own overlap (< bg_hi -> 0)."""
    all_rois = np.concatenate([rois, gt[:, :4]])
    ov = np_bbox_overlaps(all_rois, gt[:, :4])
    assign = ov.argmax(1)
    mo = ov.max(1)
    labels = gt[assign, 4]
    fg_idx = np.where(mo >= fg_thresh)[0]
    n_fg = min(int(round(fg_fraction * batch_rois)), len(fg_idx))
    fg_idx = rng.choice(fg_idx, n_fg, replace=False)
    bg_idx = np.where((mo < bg_hi) & (mo >= bg_lo))[0]
    n_bg = min(batch_rois - n_fg, len(bg_idx))
    bg_idx = rng.choice(bg_idx, n_bg, replace=False)
    keep = np.append(fg_idx, bg_idx)
    while len(keep) < batch_rois:
        gap = min(len(all_rois), batch_rois - len(keep))
        keep = np.append(keep, rng.choice(len(all_rois), gap, replace=False))
    keep = keep[:batch_rois].astype(int)
    lab = labels[keep].copy()
    lab[mo[keep] < bg_hi] = 0
    return keep, lab


def test_sample_rois_repeat_padding_distribution(rng):
    """pad_mode='repeat' matches the reference's gap-sampling distribution:
    fixed fg/bg counts per draw, and padded minibatches contain duplicate rois
    at the oracle's rate (the 'distinct' mode provably cannot duplicate)."""
    R, G = 12, 2
    gt, gvalid = make_gt(rng, G, G)
    # 3 fg rois near gt0, 4 bg far away -> 7 candidates + 2 gt rows, so a
    # 16-roi minibatch needs ~7 gap rows every draw
    fgs = gt[0, :4] + rng.uniform(-2, 2, (3, 4))
    bgs = np.stack([rng.uniform(150, 170, R - 3)] * 4, 1) + [[0, 0, 15, 15]]
    rois = np.concatenate([fgs, bgs]).astype(np.float32)
    valid = np.ones(R, bool)
    BATCH = 16

    fg_counts, dup_counts = [], []
    for t in range(30):
        out = sample_rois(jnp.asarray(rois), jnp.asarray(valid),
                          jnp.asarray(gt), jnp.asarray(gvalid),
                          jax.random.PRNGKey(t), batch_rois=BATCH,
                          num_reg_classes=2, fg_fraction=0.25)
        lab = np.asarray(out["label"])
        sel = np.asarray(out["rois"])
        assert lab.shape == (BATCH,) and (lab >= 0).all()   # no ignore rows
        fg_counts.append((lab > 0).sum())
        uniq = len(np.unique(sel.round(3), axis=0))
        dup_counts.append(BATCH - uniq)

    o_fg, o_dup = [], []
    nprng = np.random.RandomState(0)
    for _ in range(200):
        keep, lab = np_sample_rois_oracle(rois, gt, BATCH, 0.25, 0.5, 0.5,
                                          0.0, nprng)
        o_fg.append((lab > 0).sum())
        o_dup.append(BATCH - len(np.unique(keep)))

    # every minibatch needs gap rows here -> duplicates must occur
    assert np.mean(dup_counts) > 0, "repeat mode produced no duplicates"
    assert abs(np.mean(fg_counts) - np.mean(o_fg)) < 1.0, \
        (np.mean(fg_counts), np.mean(o_fg))
    assert abs(np.mean(dup_counts) - np.mean(o_dup)) < 1.5, \
        (np.mean(dup_counts), np.mean(o_dup))


def test_sample_rois_distinct_mode_no_duplicates(rng):
    R, G = 12, 2
    gt, gvalid = make_gt(rng, G, G)
    rois = np.concatenate([gt[0, :4] + rng.uniform(-2, 2, (3, 4)),
                           np.stack([rng.uniform(150, 170, R - 3)] * 4, 1)
                           + [[0, 0, 15, 15]]]).astype(np.float32)
    out = sample_rois(jnp.asarray(rois), jnp.ones(R, bool), jnp.asarray(gt),
                      jnp.asarray(gvalid), jax.random.PRNGKey(0),
                      batch_rois=14, num_reg_classes=2, fg_fraction=0.25,
                      pad_mode="distinct")
    sel = np.asarray(out["rois"])
    assert len(np.unique(sel.round(3), axis=0)) == 14


def test_learn_nms_losses_saturated_score_finite_under_jit():
    """Regression: softmax*sigmoid saturates nms_multi_score to exactly 1.0f,
    and under jit XLA reassociates (1 - s) + eps into (1 + eps) - s, where
    1 + 1e-8 constant-folds to 1.0f -> log(0) = -inf -> 0 * -inf = NaN on
    target==1 entries (eager evaluation was finite, making this jit-only).
    The loss must clamp strictly below 1."""
    import jax
    import jax.numpy as jnp
    from relation_tpu.models.losses import learn_nms_losses

    s = jnp.ones((4, 3, 2), jnp.float32)                 # fully saturated
    t = jnp.zeros((4, 3, 2), jnp.float32).at[0, 0, 0].set(1.0)
    for f in (learn_nms_losses, jax.jit(learn_nms_losses)):
        total, pos, neg = f(s, t, 1.0, 4.0)
        assert np.isfinite(float(total)) and np.isfinite(float(neg)), (
            float(total), float(pos), float(neg))
