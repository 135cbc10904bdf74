"""Adversarial COCO-eval parity: our CocoEvaluator vs the REFERENCE's vendored
cocoeval run as an oracle.

The reference vendors pycocotools (lib/dataset/pycocotools/cocoeval.py); its
matching/accumulate logic is pure numpy + python, so we exec that exact source
(with mechanical py2->py3 fixes and the Cython ``mask.iou`` replaced by a numpy
bbox-IoU with identical crowd semantics) and compare all 12 summary stats on
adversarial fixtures: crowd gts, area-boundary boxes (exactly 32^2 / 96^2),
ignored-gt tie/break cases, score ties, >100-det truncation, images with dets
but no gt and vice versa.
"""

import json
import re
import types

import numpy as np
import pytest

from relation_tpu.data.coco import CocoDataset
from relation_tpu.data.eval import CocoEvaluator, format_coco_summary

COCOEVAL_SRC = "/root/reference/lib/dataset/pycocotools/cocoeval.py"


# ---------------------------------------------------------------------------
# oracle: the vendored cocoeval, mechanically ported to py3
# ---------------------------------------------------------------------------

def _bbox_iou_crowd(d, g, iscrowd):
    """numpy drop-in for pycocotools mask.iou on bbox lists: plain xywh IoU,
    crowd gt denominators use the det area (maskApi.c bbIou semantics)."""
    d = np.asarray(d, float).reshape(-1, 4)
    g = np.asarray(g, float).reshape(-1, 4)
    iscrowd = np.asarray(iscrowd, bool)
    iw = (np.minimum(d[:, None, 0] + d[:, None, 2], g[None, :, 0] + g[None, :, 2])
          - np.maximum(d[:, None, 0], g[None, :, 0]))
    ih = (np.minimum(d[:, None, 1] + d[:, None, 3], g[None, :, 1] + g[None, :, 3])
          - np.maximum(d[:, None, 1], g[None, :, 1]))
    inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
    da = (d[:, 2] * d[:, 3])[:, None]
    ga = (g[:, 2] * g[:, 3])[None, :]
    union = np.where(iscrowd[None, :], da, da + ga - inter)
    return np.where(union > 0, inter / np.maximum(union, 1e-300), 0.0)


@pytest.fixture(scope="module")
def ref_cocoeval():
    with open(COCOEVAL_SRC) as f:
        src = f.read()
    # py2 -> py3, purely mechanical (no algorithmic edits):
    src = re.sub(r"(?m)^(\s*)print .*$", r"\1pass", src)
    src = src.replace("import mask\n", "")
    src = src.replace("key=lambda (ind, g): g['_ignore']",
                      "key=lambda ind_g: ind_g[1]['_ignore']")
    src = src.replace("E = filter(None, E)",
                      "E = [e for e in E if e is not None]")
    src = src.replace("dtype=np.float", "dtype=float")
    # old numpy allowed indexing with an empty float array (np.array([]))
    src = src.replace("np.array(gtind)", "np.array(gtind, dtype=int)")
    src = src.replace("np.round((0.95-.5)/.05)+1",
                      "int(np.round((0.95-.5)/.05))+1")
    src = src.replace("np.round((1.00-.0)/.01)+1",
                      "int(np.round((1.00-.0)/.01))+1")
    ns = {"np": np, "mask": types.SimpleNamespace(iou=_bbox_iou_crowd)}
    exec(compile(src, COCOEVAL_SRC, "exec"), ns)
    return ns["COCOeval"]


class FakeCOCO:
    """Just enough of the pycocotools COCO api for COCOeval bbox evaluation."""

    def __init__(self, image_ids, cat_ids, anns):
        self.image_ids = sorted(image_ids)
        self.cat_ids = sorted(cat_ids)
        self.anns = sorted(anns, key=lambda a: (a["image_id"], a["id"]))

    def getImgIds(self):
        return list(self.image_ids)

    def getCatIds(self):
        return list(self.cat_ids)

    def getAnnIds(self, imgIds=None, catIds=None):
        return [a["id"] for a in self.anns
                if (not imgIds or a["image_id"] in set(imgIds))
                and (not catIds or a["category_id"] in set(catIds))]

    def loadAnns(self, ids):
        by_id = {a["id"]: a for a in self.anns}
        return [by_id[i] for i in ids]


def run_oracle(COCOeval, image_ids, cat_ids, gt_anns, dt_anns):
    ev = COCOeval(FakeCOCO(image_ids, cat_ids, gt_anns),
                  FakeCOCO(image_ids, cat_ids, dt_anns))
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    stats = ev.stats
    # per-class AP @0.50:0.95/all/100 like _print_detection_metrics
    # (lib/dataset/coco.py:275-281)
    per_class = {}
    for ki, cat in enumerate(sorted(cat_ids)):
        p = ev.eval["precision"][:, :, ki, 0, 2]
        per_class[cat] = float(np.mean(p[p > -1])) if (p > -1).any() \
            else float("nan")
    return stats, per_class


def run_ours(tmp_path, image_ids, cat_ids, gt_anns, dt_anns):
    doc = {
        "images": [{"id": i, "height": 480, "width": 640,
                    "file_name": f"im{i}.jpg"} for i in sorted(image_ids)],
        "categories": [{"id": c, "name": f"cat{c}"} for c in sorted(cat_ids)],
        "annotations": gt_anns,
    }
    f = str(tmp_path / "instances.json")
    with open(f, "w") as fh:
        json.dump(doc, fh)
    ds = CocoDataset(f)
    ev = CocoEvaluator(ds)
    by_img = {}
    for a in sorted(dt_anns, key=lambda a: (a["image_id"], a["id"])):
        x, y, w, h = a["bbox"]
        by_img.setdefault(a["image_id"], []).append(
            [ds.cat_to_class[a["category_id"]], a["score"],
             x, y, x + w - 1, y + h - 1])
    for img_id, rows in by_img.items():
        ev.add_detections(img_id, np.asarray(rows, float))
    res = ev.summarize()
    # map class indices back to category ids for comparison
    res["per_class"] = {ds.class_to_cat[c]: v
                        for c, v in res["per_class"].items()}
    return res


STAT_KEYS = ["AP", "AP50", "AP75", "APs", "APm", "APl",
             "AR1", "AR10", "AR100", "ARs", "ARm", "ARl"]


def assert_parity(stats, per_class, res, cat_ids):
    for i, k in enumerate(STAT_KEYS):
        ref = float(stats[i])
        got = res[k]
        if ref == -1:                        # cocoeval's "no gt" marker
            assert got != got, k             # ours: NaN
        else:
            np.testing.assert_allclose(got, ref, atol=1e-9, err_msg=k)
    for cat in cat_ids:
        ref = per_class.get(cat, float("nan"))
        got = res["per_class"].get(cat, float("nan"))
        if ref != ref:
            assert got != got, f"per_class[{cat}]"
        else:
            np.testing.assert_allclose(got, ref, atol=1e-9,
                                       err_msg=f"per_class[{cat}]")


# ---------------------------------------------------------------------------
# hand-built adversarial cases
# ---------------------------------------------------------------------------

def _gt(i, img, cat, x, y, w, h, crowd=0, area=None):
    return {"id": i, "image_id": img, "category_id": cat,
            "bbox": [float(x), float(y), float(w), float(h)],
            "area": float(w * h if area is None else area),
            "iscrowd": crowd}


def _dt(i, img, cat, x, y, w, h, score):
    return {"id": i, "image_id": img, "category_id": cat,
            "bbox": [float(x), float(y), float(w), float(h)],
            "area": float(w * h), "score": float(score)}


def test_crowd_fallback_and_break_rule(ref_cocoeval, tmp_path):
    """det2 overlaps only a crowd gt -> ignored (not FP); det3 has a real
    candidate AND a higher-IoU crowd gt later -> the break rule keeps the real
    match (a max-IoU matcher would get this wrong)."""
    gt = [_gt(1, 1, 1, 10, 10, 40, 40),
          _gt(2, 1, 1, 100, 100, 60, 60, crowd=1),
          _gt(3, 1, 1, 200, 200, 40, 40)]
    dt = [_dt(1, 1, 1, 10, 10, 40, 40, 0.9),       # exact TP on gt1
          _dt(2, 1, 1, 105, 105, 55, 55, 0.8),     # only crowd overlap
          # IoU vs gt3 ~0.68 (real), vs a crowd shifted copy higher:
          _dt(3, 1, 1, 205, 205, 40, 40, 0.7)]
    gt.append(_gt(4, 1, 1, 204, 204, 41, 41, crowd=1))
    stats, per_class = run_oracle(ref_cocoeval, [1], [1], gt, dt)
    res = run_ours(tmp_path, [1], [1], gt, dt)
    assert_parity(stats, per_class, res, [1])
    assert res["AP50"] == pytest.approx(1.0)       # no FPs: both dets resolve


def test_area_boundary_exact(ref_cocoeval, tmp_path):
    """gt areas exactly 32^2 and 96^2 are INSIDE both adjacent ranges
    (cocoeval ignores only area<lo or area>hi)."""
    gt = [_gt(1, 1, 1, 10, 10, 32, 32),            # area == 1024
          _gt(2, 1, 1, 100, 100, 96, 96),          # area == 9216
          _gt(3, 1, 1, 300, 300, 10, 10)]          # clearly small
    dt = [_dt(1, 1, 1, 10, 10, 32, 32, 0.9),
          _dt(2, 1, 1, 100, 100, 96, 96, 0.8),
          _dt(3, 1, 1, 300, 300, 10, 10, 0.7)]
    stats, per_class = run_oracle(ref_cocoeval, [1], [1], gt, dt)
    res = run_ours(tmp_path, [1], [1], gt, dt)
    assert_parity(stats, per_class, res, [1])
    # boundary gts count for both neighboring area ranges
    assert res["APs"] == pytest.approx(1.0)
    assert res["APm"] == pytest.approx(1.0)
    assert res["APl"] == pytest.approx(1.0)


def test_dets_without_gt_and_gt_without_dets(ref_cocoeval, tmp_path):
    gt = [_gt(1, 1, 1, 10, 10, 40, 40)]
    dt = [_dt(1, 2, 1, 10, 10, 40, 40, 0.9),       # FP on the empty image
          _dt(2, 1, 2, 10, 10, 40, 40, 0.8)]       # class with no gt at all
    stats, per_class = run_oracle(ref_cocoeval, [1, 2], [1, 2], gt, dt)
    res = run_ours(tmp_path, [1, 2], [1, 2], gt, dt)
    assert_parity(stats, per_class, res, [1, 2])


# ---------------------------------------------------------------------------
# randomized adversarial sweep
# ---------------------------------------------------------------------------

def _random_case(seed):
    r = np.random.RandomState(seed)
    image_ids = list(range(1, 5))
    cat_ids = [3, 7, 11]
    gt, dt = [], []
    gid = did = 1
    for img in image_ids:
        for cat in cat_ids:
            for _ in range(r.randint(0, 5)):
                # quantized coords/sizes -> frequent exact IoU ties, areas
                # straddling the 32^2/96^2 boundaries
                x, y = r.randint(0, 300, 2) * 1.0
                w = float(r.choice([8, 16, 32, 33, 95, 96, 97, 128]))
                h = float(r.choice([8, 16, 32, 33, 95, 96, 97, 128]))
                crowd = int(r.rand() < 0.25)
                gt.append(_gt(gid, img, cat, x, y, w, h, crowd=crowd))
                gid += 1
                for _ in range(r.randint(0, 4)):   # jittered dets near this gt
                    dx, dy = r.randint(-8, 9, 2) * 1.0
                    score = float(r.choice([0.3, 0.5, 0.5, 0.7, 0.9]))
                    dt.append(_dt(did, img, cat, x + dx, y + dy,
                                  max(4.0, w + r.randint(-6, 7)),
                                  max(4.0, h + r.randint(-6, 7)), score))
                    did += 1
            for _ in range(r.randint(0, 3)):       # random far FPs
                x, y = r.randint(0, 500, 2) * 1.0
                dt.append(_dt(did, img, cat, x, y,
                              float(r.randint(5, 120)),
                              float(r.randint(5, 120)),
                              float(r.choice([0.2, 0.4, 0.5]))))
                did += 1
    # one (image, class) with >100 dets to force maxDet truncation
    for _ in range(120):
        x, y = r.randint(0, 400, 2) * 1.0
        dt.append(_dt(did, 1, 3, x, y, 20.0, 20.0,
                      float(r.choice([0.1, 0.15, 0.2]))))
        did += 1
    return image_ids, cat_ids, gt, dt


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_randomized_parity(ref_cocoeval, tmp_path, seed):
    image_ids, cat_ids, gt, dt = _random_case(seed)
    stats, per_class = run_oracle(ref_cocoeval, image_ids, cat_ids, gt, dt)
    res = run_ours(tmp_path, image_ids, cat_ids, gt, dt)
    assert_parity(stats, per_class, res, cat_ids)


def test_large_fixture_parity(ref_cocoeval, tmp_path):
    """Dataset-shaped parity (round-2 verdict: the matcher had only seen <=6
    boxes/fixture): 60 images x 10 classes, ~25 dets/image with jittered TPs,
    far FPs, crowds and boundary areas — the native coco_match_image path
    (utils/native.py) against the exec'd reference cocoeval, all 12 stats."""
    r = np.random.RandomState(7)
    image_ids = list(range(1, 61))
    cat_ids = list(range(1, 11))
    gt, dt = [], []
    gid = did = 1
    for img in image_ids:
        for _ in range(r.randint(2, 9)):
            cat = int(r.choice(cat_ids))
            x, y = r.randint(0, 400, 2) * 1.0
            w = float(r.choice([8, 16, 31, 32, 33, 64, 95, 96, 97, 128]))
            h = float(r.choice([8, 16, 31, 32, 33, 64, 95, 96, 97, 128]))
            gt.append(_gt(gid, img, cat, x, y, w, h,
                          crowd=int(r.rand() < 0.15)))
            gid += 1
            for _ in range(r.randint(0, 5)):
                dx, dy = r.randint(-10, 11, 2) * 1.0
                dt.append(_dt(did, img, cat, x + dx, y + dy,
                              max(4.0, w + r.randint(-8, 9)),
                              max(4.0, h + r.randint(-8, 9)),
                              float(r.rand())))
                did += 1
        for _ in range(r.randint(5, 15)):           # far FPs, random class
            x, y = r.randint(0, 600, 2) * 1.0
            dt.append(_dt(did, img, int(r.choice(cat_ids)), x, y,
                          float(r.randint(5, 150)), float(r.randint(5, 150)),
                          float(r.rand() * 0.5)))
            did += 1
    stats, per_class = run_oracle(ref_cocoeval, image_ids, cat_ids, gt, dt)
    res = run_ours(tmp_path, image_ids, cat_ids, gt, dt)
    assert_parity(stats, per_class, res, cat_ids)


def test_summary_formatting():
    res = {k: 0.5 for k in STAT_KEYS}
    res["per_class"] = {1: 0.25, 2: float("nan")}
    text = format_coco_summary(res, ["person", "bicycle"])
    assert "Average Precision" in text and "Average Recall" in text
    assert "maxDets=  1" in text and "maxDets= 10" in text
    assert "person" in text
    assert len([l for l in text.splitlines() if "@[" in l]) == 12
