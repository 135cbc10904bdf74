"""Numeric-core parity tests against NumPy oracles (the reference's own formulas)."""

import numpy as np
import jax.numpy as jnp

from relation_tpu.ops import (bbox_transform, bbox_pred, clip_boxes, bbox_overlaps,
                              generate_anchors, shift_anchors, greedy_nms_mask,
                              greedy_nms_topk, soft_nms, refine_bbox)
from tests.reference_impls import (np_bbox_transform, np_bbox_pred, np_bbox_overlaps,
                                   np_greedy_nms, np_generate_anchors)


def random_boxes(rng, n, size=600):
    x1 = rng.uniform(0, size - 20, n)
    y1 = rng.uniform(0, size - 20, n)
    w = rng.uniform(4, size / 2, n)
    h = rng.uniform(4, size / 2, n)
    return np.stack([x1, y1, np.minimum(x1 + w, size - 1),
                     np.minimum(y1 + h, size - 1)], axis=1).astype(np.float32)


def test_bbox_transform_matches(rng):
    ex = random_boxes(rng, 64)
    gt = random_boxes(rng, 64)
    got = np.asarray(bbox_transform(jnp.asarray(ex), jnp.asarray(gt)))
    want = np_bbox_transform(ex.astype(np.float64), gt.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_bbox_pred_roundtrip(rng):
    ex = random_boxes(rng, 32)
    gt = random_boxes(rng, 32)
    deltas = np_bbox_transform(ex, gt).astype(np.float32)
    got = np.asarray(bbox_pred(jnp.asarray(ex), jnp.asarray(deltas)))
    np.testing.assert_allclose(got, gt, rtol=1e-3, atol=1e-2)


def test_bbox_pred_multiclass(rng):
    boxes = random_boxes(rng, 16)
    deltas = rng.randn(16, 8).astype(np.float32) * 0.2
    got = np.asarray(bbox_pred(jnp.asarray(boxes), jnp.asarray(deltas)))
    want = np_bbox_pred(boxes.astype(np.float64), deltas.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_clip_boxes(rng):
    boxes = random_boxes(rng, 16) * 2 - 100
    got = np.asarray(clip_boxes(jnp.asarray(boxes), (300, 400)))
    assert got[:, 0].min() >= 0 and got[:, 1].min() >= 0
    assert got[:, 2].max() <= 399 and got[:, 3].max() <= 299


def test_bbox_overlaps(rng):
    b = random_boxes(rng, 40)
    q = random_boxes(rng, 17)
    got = np.asarray(bbox_overlaps(jnp.asarray(b), jnp.asarray(q)))
    want = np_bbox_overlaps(b.astype(np.float64), q.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_generate_anchors_parity():
    for scales in [(8, 16, 32), (4, 8, 16, 32)]:
        got = generate_anchors(16, (0.5, 1, 2), scales)
        want = np_generate_anchors(16, (0.5, 1, 2), scales)
        np.testing.assert_allclose(got, want)


def test_shift_anchors_layout():
    base = generate_anchors(16, (0.5, 1, 2), (8,))
    grid = np.asarray(shift_anchors(base, 3, 5, 16))
    assert grid.shape == (3 * 5 * 3, 4)
    # (h, w, a) slowest-to-fastest: entry [w=1, a=0] shifted by 16 in x
    np.testing.assert_allclose(grid[3] - grid[0], [16, 0, 16, 0])
    # entry [h=1] shifted by 16 in y
    np.testing.assert_allclose(grid[5 * 3] - grid[0], [0, 16, 0, 16])


def test_greedy_nms_exact_parity(rng):
    # clustered boxes to force deep suppression chains
    for trial in range(5):
        n = 200
        centers = rng.uniform(50, 250, (10, 2))
        pick = rng.randint(0, 10, n)
        jitter = rng.uniform(-12, 12, (n, 2))
        cxy = centers[pick] + jitter
        wh = rng.uniform(20, 60, (n, 2))
        boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], axis=1).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        dets = np.concatenate([boxes, scores[:, None]], axis=1)
        want_keep = set(np_greedy_nms(dets.astype(np.float64), 0.5))
        got_mask = np.asarray(greedy_nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                              0.5, block_size=64))
        got_keep = set(np.where(got_mask)[0].tolist())
        assert got_keep == want_keep, f"trial {trial}: {got_keep ^ want_keep}"


def test_greedy_nms_topk_padding(rng):
    boxes = random_boxes(rng, 50)
    scores = rng.uniform(0, 1, 50).astype(np.float32)
    idx, real = greedy_nms_topk(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 80)
    idx, real = np.asarray(idx), np.asarray(real)
    assert idx.shape == (80,)
    n_real = real.sum()
    assert 0 < n_real <= 50
    # padding duplicates kept entries
    assert set(idx[~real]).issubset(set(idx[real]))
    # kept in descending score order
    s = scores[idx[real]]
    assert np.all(np.diff(s) <= 1e-6)


def test_greedy_nms_respects_valid_mask(rng):
    boxes = random_boxes(rng, 30)
    scores = rng.uniform(0, 1, 30).astype(np.float32)
    valid = np.zeros(30, dtype=bool)
    valid[:10] = True
    mask = np.asarray(greedy_nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                                      jnp.asarray(valid)))
    assert not mask[10:].any()


def test_soft_nms_decays_overlapping(rng):
    # two heavily overlapping boxes + one disjoint
    boxes = np.array([[0, 0, 100, 100], [5, 5, 105, 105], [300, 300, 400, 400]],
                     dtype=np.float32)
    scores = np.array([0.9, 0.8, 0.7], dtype=np.float32)
    idx, ks, kv = soft_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 3)
    idx, ks = np.asarray(idx), np.asarray(ks)
    assert idx[0] == 0 and ks[0] == scores[0]
    # the overlapping box must be decayed, the disjoint one not
    pos1 = list(idx).index(1)
    pos2 = list(idx).index(2)
    assert ks[pos1] < 0.8 * 0.9
    np.testing.assert_allclose(ks[pos2], 0.7, rtol=1e-5)


def test_refine_bbox_clip(rng):
    boxes = random_boxes(rng, 8)
    deltas = rng.randn(8, 4).astype(np.float32) * 0.5
    out = np.asarray(refine_bbox(jnp.asarray(boxes), jnp.asarray(deltas),
                                 im_hw=(200.0, 300.0)))
    assert out.shape == (8, 4, 1)
    assert out[:, 0].min() >= 0 and out[:, 2].max() <= 299
    assert out[:, 1].min() >= 0 and out[:, 3].max() <= 199


def test_greedy_nms_early_exit_exact(rng):
    """max_keep early exit must agree with the full sweep on the top-k kept set."""
    n = 400
    centers = rng.uniform(50, 450, (25, 2))
    pick = rng.randint(0, 25, n)
    cxy = centers[pick] + rng.uniform(-15, 15, (n, 2))
    wh = rng.uniform(20, 80, (n, 2))
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], 1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    full = np.asarray(greedy_nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                      0.5, block_size=64))
    early = np.asarray(greedy_nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                       0.5, block_size=64, max_keep=10))
    # the top-10 kept (by score) must be identical
    order = np.argsort(-scores)
    kept_full = [i for i in order if full[i]][:10]
    kept_early = [i for i in order if early[i]][:10]
    assert kept_full == kept_early
    assert early.sum() >= 10 or early.sum() == full.sum()


def test_classwise_nms_pallas_matches_vmap(rng):
    """The batched Pallas classwise path (interpret mode) agrees with the
    vmapped XLA path on the top-max_keep kept set per class."""
    from relation_tpu.ops.nms import _classwise_nms_pallas, classwise_nms

    C, n, cap = 4, 96, 6
    centers = rng.uniform(40, 400, (10, 2))
    pick = rng.randint(0, 10, (C, n))
    cxy = centers[pick] + rng.uniform(-12, 12, (C, n, 2))
    wh = rng.uniform(15, 70, (C, n, 2))
    boxes = jnp.asarray(np.concatenate([cxy - wh / 2, cxy + wh / 2], -1)
                        .astype(np.float32))
    scores = jnp.asarray(rng.uniform(0, 1, (C, n)).astype(np.float32))
    valid = jnp.asarray(rng.uniform(0, 1, (C, n)) > 0.1)
    vm = valid & (scores > 1e-3)

    ref = np.asarray(classwise_nms(boxes, scores, 0.5, 1e-3, valid,
                                   max_keep=cap))
    got = np.asarray(_classwise_nms_pallas(boxes, scores, vm, 0.5, cap,
                                           interpret=True))
    sc = np.asarray(scores)
    for c in range(C):
        order = np.argsort(-sc[c], kind="stable")
        a = [i for i in order if ref[c, i]][:cap]
        b = [i for i in order if got[c, i]][:cap]
        assert a == b, c


def test_gathers_grad_parity(rng):
    """take_rows/take_along0 hand-written matmul VJPs == plain-gather autodiff,
    including duplicate indices (production learn-NMS grad path,
    ops/gathers.py)."""
    import jax
    from relation_tpu.ops.gathers import take_rows, take_along0
    x = jnp.asarray(rng.randn(7, 5).astype(np.float32))
    idx = jnp.asarray(np.array([0, 3, 3, 6, 1], np.int32))   # dup index 3
    g_out = jnp.asarray(rng.randn(5, 5).astype(np.float32))

    def loss_custom(x):
        return jnp.sum(take_rows(x, idx) * g_out)

    def loss_plain(x):
        return jnp.sum(x[idx] * g_out)

    np.testing.assert_allclose(np.asarray(jax.grad(loss_custom)(x)),
                               np.asarray(jax.grad(loss_plain)(x)),
                               rtol=1e-6, atol=1e-6)

    idx2 = jnp.asarray(rng.randint(0, 7, size=(4, 5)).astype(np.int32))
    idx2 = idx2.at[0].set(idx2[1])                           # dup rows

    def loss_custom2(x):
        return jnp.sum(take_along0(x, idx2) * g_out[:4])

    def loss_plain2(x):
        return jnp.sum(jnp.take_along_axis(x, idx2, axis=0) * g_out[:4])

    np.testing.assert_allclose(np.asarray(jax.grad(loss_custom2)(x)),
                               np.asarray(jax.grad(loss_plain2)(x)),
                               rtol=1e-6, atol=1e-6)

    # under vmap (how the trainer uses them: jax.vmap(per_image))
    xb = jnp.asarray(rng.randn(3, 7, 5).astype(np.float32))

    def batched(fn):
        return jax.grad(lambda xs: jnp.sum(jax.vmap(fn)(xs)))(xb)

    np.testing.assert_allclose(
        np.asarray(batched(lambda x: jnp.sum(take_rows(x, idx) * g_out))),
        np.asarray(batched(lambda x: jnp.sum(x[idx] * g_out))),
        rtol=1e-6, atol=1e-6)
