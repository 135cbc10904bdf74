"""Data pipeline + COCO evaluator tests (synthetic annotations, no image files)."""

import json
import os

import numpy as np
import pytest

from relation_tpu.data.coco import CocoDataset, filter_roidb
from relation_tpu.data.eval import CocoEvaluator
from relation_tpu.data.image import (resize_im, pick_bucket, pad_to_bucket,
                                     flip_boxes, prepare_image)
from relation_tpu.data.loader import TrainLoader, TestLoader
from relation_tpu.config.defaults import default_config


@pytest.fixture
def coco_json(tmp_path, rng):
    images, anns = [], []
    aid = 1
    for i in range(4):
        images.append({"id": i + 1, "file_name": f"im{i}.jpg",
                       "height": 240, "width": 320})
        for _ in range(rng.randint(1, 4)):
            x, y = rng.uniform(0, 200), rng.uniform(0, 140)
            w, h = rng.uniform(20, 80), rng.uniform(20, 70)
            anns.append({"id": aid, "image_id": i + 1,
                         "category_id": int(rng.choice([1, 3, 18])),
                         "bbox": [float(x), float(y), float(w), float(h)],
                         "area": float(w * h), "iscrowd": 0})
            aid += 1
    cats = [{"id": c, "name": str(c)} for c in (1, 3, 18)]
    p = tmp_path / "ann.json"
    p.write_text(json.dumps({"images": images, "annotations": anns,
                             "categories": cats}))
    return str(p)


def test_coco_dataset_roidb(coco_json):
    ds = CocoDataset(coco_json)
    assert ds.num_classes == 4
    roidb = ds.roidb(flip=True)
    assert len(roidb) == 8
    e = roidb[0]
    assert e["boxes"].shape[1] == 4
    assert (e["boxes"][:, 2] <= e["width"] - 1).all()
    f = roidb[4]
    assert f["flipped"]
    # flip is involutive w.r.t. widths
    np.testing.assert_allclose(flip_boxes(f["boxes"], f["width"]), e["boxes"],
                               atol=1e-5)
    assert len(filter_roidb(roidb)) == 8


def test_evaluator_perfect_detections(coco_json):
    ds = CocoDataset(coco_json)
    ev = CocoEvaluator(ds)
    for img_id in ds.image_ids:
        e = ds.roidb_entry(img_id)
        dets = np.concatenate([
            e["gt_classes"][:, None].astype(np.float32),
            np.full((len(e["boxes"]), 1), 0.9, np.float32),
            e["boxes"]], axis=1)
        ev.add_detections(img_id, dets)
    r = ev.summarize()
    assert r["AP"] > 0.95, r
    assert r["AP50"] > 0.95


def test_evaluator_penalizes_misses_and_fps(coco_json, rng):
    ds = CocoDataset(coco_json)
    # only half the images get detections + one high-score false positive each
    ev = CocoEvaluator(ds)
    for k, img_id in enumerate(ds.image_ids):
        e = ds.roidb_entry(img_id)
        if k % 2 == 0:
            dets = np.concatenate([
                e["gt_classes"][:, None].astype(np.float32),
                np.full((len(e["boxes"]), 1), 0.9, np.float32),
                e["boxes"]], axis=1)
            ev.add_detections(img_id, dets)
        ev.add_detections(img_id, np.asarray([[1.0, 0.95, 5, 5, 10, 10]]))
    r = ev.summarize()
    assert 0.0 < r["AP"] < 0.8, r


def test_evaluator_wrong_class_is_zero(coco_json):
    ds = CocoDataset(coco_json)
    ev = CocoEvaluator(ds)
    for img_id in ds.image_ids:
        e = ds.roidb_entry(img_id)
        wrong = (e["gt_classes"] % 3) + 1  # shift all classes
        dets = np.concatenate([
            wrong[:, None].astype(np.float32),
            np.full((len(e["boxes"]), 1), 0.9, np.float32), e["boxes"]], axis=1)
        ev.add_detections(img_id, dets)
    r = ev.summarize()
    assert r["AP"] < 0.05


def test_image_pipeline(rng):
    im = rng.randint(0, 255, (240, 320, 3)).astype(np.float32)
    out, scale = resize_im(im, 600, 1000)
    assert abs(min(out.shape[:2]) - 600) <= 1
    assert max(out.shape[:2]) <= 1000
    assert pick_bucket(601, 801, [(608, 1024), (1024, 1024)]) == (608, 1024)
    padded = pad_to_bucket(out, (1024, 1024))
    assert padded.shape == (1024, 1024, 3)
    boxes = np.asarray([[10, 10, 100, 100, 1]], np.float32)
    img, info, b = prepare_image(im, 60, 100, (103, 115, 123),
                                 [(64, 96), (96, 96)], flip=True, boxes=boxes)
    assert img.shape[0] in (64, 96)
    assert info[2] > 0 and b is not None
    # flipped: x1' = W - x2 - 1 at original scale, then scaled
    assert abs(b[0, 0] - (320 - 100 - 1) * info[2]) < 1e-3


def test_pad_to_bucket_rejects_oversize(rng):
    """An image larger than the largest bucket must hard-error, never crop
    (a crop would silently truncate pixels while gt boxes keep pointing
    off-image)."""
    im = rng.randint(0, 255, (100, 100, 3)).astype(np.uint8)
    with pytest.raises(ValueError, match="exceeds the largest image bucket"):
        pad_to_bucket(im, (96, 96))
    with pytest.raises(ValueError, match="exceeds"):
        # SCALES bigger than every bucket: prepare_image must refuse too
        prepare_image(im.astype(np.float32), 600, 1000, (0, 0, 0),
                      [(64, 96), (96, 96)])


def test_train_loader_batches(coco_json, rng):
    cfg = default_config()
    cfg.SCALES = [(60, 100)]
    cfg.TPU.IMAGE_BUCKETS = [(48, 64), (64, 96)]
    cfg.TPU.MAX_GT = 8
    cfg.network.PIXEL_MEANS = np.array([100.0, 100.0, 100.0])
    ds = CocoDataset(coco_json)
    roidb = filter_roidb(ds.roidb(flip=True))

    def fake_loader(path):
        return rng.randint(0, 255, (240, 320, 3)).astype(np.float32)

    loader = TrainLoader(roidb, cfg, batch_size=2, image_loader=fake_loader)
    batches = list(loader)
    assert len(batches) == len(roidb) // 2
    b = batches[0]
    # default batch layout is s2d planar [B, 12, H/2, W/2] (TPU-first input)
    assert b["image"].shape[0] == 2 and b["image"].shape[1] == 12

    cfg.TPU.S2D_INPUT = False
    b_nhwc = next(iter(TrainLoader(roidb, cfg, batch_size=2,
                                   image_loader=fake_loader)))
    assert b_nhwc["image"].shape[3] == 3
    cfg.TPU.S2D_INPUT = True
    assert b["gt_boxes"].shape == (2, 8, 5)
    assert b["gt_valid"].any()
    # gt classes in range
    lbl = b["gt_boxes"][b["gt_valid"]][:, 4]
    assert ((lbl >= 1) & (lbl < 4)).all()

    tl = TestLoader(roidb[:3], cfg, image_loader=fake_loader)
    items = list(tl)
    assert len(items) == 3
    iid, img, info = items[0]
    assert img.ndim == 3 and info.shape == (3,)


def test_u8_h2d_path_bit_exact(rng):
    """TPU.H2D_UINT8: shipping post-resize uint8 + device-side mean-sub/pad-
    zeroing (core/predictor._image_from_u8) must be bit-identical to the
    host-side f32 path, in both the s2d planar and NHWC layouts."""
    import jax.numpy as jnp
    from relation_tpu.data.image import prepare_image, to_s2d_planar
    from relation_tpu.core.predictor import _image_from_u8

    im = rng.randint(0, 255, (113, 157, 3)).astype(np.float32)
    means = (103.06, 115.90, 123.15)
    buckets = [(64, 96), (96, 128)]
    f32_img, info, _ = prepare_image(im, 60, 100, means, buckets)
    u8_img, info_u8, _ = prepare_image(im, 60, 100, None, buckets)
    assert u8_img.dtype == np.uint8 and np.allclose(info, info_u8)

    # NHWC layout
    got = np.asarray(_image_from_u8(jnp.asarray(u8_img), jnp.asarray(info), means))
    np.testing.assert_array_equal(got, f32_img)
    # s2d planar layout
    got_p = np.asarray(_image_from_u8(jnp.asarray(to_s2d_planar(u8_img)),
                                      jnp.asarray(info), means))
    np.testing.assert_array_equal(got_p, to_s2d_planar(f32_img))
    # f32 input passes through untouched
    ident = _image_from_u8(jnp.asarray(f32_img), jnp.asarray(info), means)
    np.testing.assert_array_equal(np.asarray(ident), f32_img)


def test_batch_image_hw_both_layouts():
    """feat-grid derivation must see through the s2d planar loader layout
    (regression: the train driver read shape[1]//16 == 0 for planar batches)."""
    from relation_tpu.data.image import batch_image_hw
    assert batch_image_hw(np.zeros((2, 608, 1024, 3))) == (608, 1024)
    assert batch_image_hw(np.zeros((2, 12, 304, 512))) == (608, 1024)


def test_draw_detections_writes_png(tmp_path):
    """--vis path: render detections to a file (reference tester.py
    vis_all_detection equivalent) with the CLI's calling convention."""
    from relation_tpu.utils.vis import draw_detections
    im = np.random.RandomState(0).rand(60, 80, 3) * 255
    dets = np.asarray([[1, 0.9, 5, 5, 40, 30], [2, 0.4, 10, 20, 70, 55]])
    out = str(tmp_path / "v.png")
    draw_detections(im, dets, ["bg", "cat", "dog"], thresh=0.3, out_path=out)
    import os
    assert os.path.getsize(out) > 0
