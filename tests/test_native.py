"""Native detops library: build, bind, and match the Python/JAX oracles."""

import numpy as np
import pytest

from relation_tpu.utils import native
from tests.reference_impls import np_bbox_overlaps, np_greedy_nms
from tests.test_ops_core import random_boxes


def test_native_builds():
    assert native.have_native(), "libdetops.so failed to build/load"


def test_native_bbox_overlaps(rng):
    b = random_boxes(rng, 37)
    q = random_boxes(rng, 11)
    got = native.bbox_overlaps(b, q)
    want = np_bbox_overlaps(b.astype(np.float64), q.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_native_greedy_nms(rng):
    boxes = random_boxes(rng, 120)
    scores = rng.uniform(0, 1, 120).astype(np.float32)
    dets = np.concatenate([boxes, scores[:, None]], axis=1)
    got = native.greedy_nms(dets, 0.5)
    want = np_greedy_nms(dets.astype(np.float64), 0.5)
    np.testing.assert_array_equal(got, want)


def test_native_soft_nms(rng):
    boxes = np.array([[0, 0, 100, 100], [5, 5, 105, 105], [300, 300, 400, 400]],
                     dtype=np.float32)
    dets = np.concatenate([boxes, [[0.9], [0.8], [0.7]]], axis=1).astype(np.float32)
    keep, scores = native.soft_nms(dets, 0.5)
    assert keep[0] == 0 and scores[0] == np.float32(0.9)
    i1 = list(keep).index(1)
    assert scores[i1] < 0.8 * 0.9
    i2 = list(keep).index(2)
    np.testing.assert_allclose(scores[i2], 0.7, rtol=1e-5)


def test_rle_roundtrip_and_iou(rng):
    m1 = (rng.rand(13, 17) > 0.6).astype(np.uint8)
    c1 = native.rle_encode(m1)
    back = native.rle_decode(c1, 13, 17)
    np.testing.assert_array_equal(back, m1)

    m2 = (rng.rand(13, 17) > 0.6).astype(np.uint8)
    c2 = native.rle_encode(m2)
    inter = np.sum((m1 & m2).astype(np.int64))
    union = np.sum((m1 | m2).astype(np.int64))
    want = inter / union if union else 0.0
    got = native.rle_iou(c1, c2)
    np.testing.assert_allclose(got, want, rtol=1e-9)
    # crowd semantics: intersection / area(a)
    got_c = native.rle_iou(c1, c2, iscrowd=True)
    np.testing.assert_allclose(got_c, inter / max(m1.sum(), 1), rtol=1e-9)
