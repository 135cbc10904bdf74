"""CocoEvaluator.summarize at minival scale (round-2 verdict weak #3).

Synthesizes a 5k-image dataset with ~300 dets/image (the TEST.max_per_image
cap) and ~7 gts/image over 80 classes — the shape of a real COCO minival
evaluation — and times the full summarize() (matching + accumulate + 12 stats
+ per-class table). The matcher is the native coco_match_image
(native/detops.cpp; exec'd-cocoeval-oracle parity pinned by
tests/test_eval_oracle.py incl. the dataset-shaped test_large_fixture_parity).

--python-fallback times the pure-Python matcher on --n-py images for the
speedup figure (it is the reason the native path exists).

Usage: python tools/bench_eval_summarize.py [--n 5000] [--dets 300]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def synth(root: str, n_img: int, dets_per_img: int, seed: int = 0):
    """COCO-shaped gt json + detections: jittered TPs around gts, score-decayed
    FPs, Zipf-ish class skew (real detectors emit most dets in few classes)."""
    r = np.random.RandomState(seed)
    images, anns = [], []
    aid = 0
    dets_by_img = {}
    class_pool = np.arange(1, 81)
    for i in range(n_img):
        img_id = i + 1
        W, H = 640, 480
        images.append({"id": img_id, "file_name": f"i{img_id}.jpg",
                       "width": W, "height": H})
        rows = []
        n_gt = r.randint(2, 13)
        for _ in range(n_gt):
            cat = int(class_pool[min(int(r.zipf(1.6)) - 1, 79)])
            x, y = r.uniform(0, W - 120), r.uniform(0, H - 120)
            w = float(r.choice([8, 16, 31, 32, 48, 95, 96, 120]))
            h = float(r.choice([8, 16, 31, 32, 48, 95, 96, 120]))
            aid += 1
            anns.append({"id": aid, "image_id": img_id, "category_id": cat,
                         "bbox": [x, y, w, h], "area": w * h,
                         "iscrowd": int(r.rand() < 0.08)})
            for _ in range(r.randint(1, 5)):        # jittered candidates
                dx, dy = r.uniform(-10, 10, 2)
                rows.append([cat, r.rand(),
                             x + dx, y + dy,
                             x + dx + max(4, w + r.uniform(-8, 8)) - 1,
                             y + dy + max(4, h + r.uniform(-8, 8)) - 1])
        while len(rows) < dets_per_img:             # low-score FP tail
            cat = int(class_pool[min(int(r.zipf(1.6)) - 1, 79)])
            x, y = r.uniform(0, W - 50), r.uniform(0, H - 50)
            w, h = r.uniform(5, 150), r.uniform(5, 150)
            rows.append([cat, r.rand() * 0.3, x, y, x + w - 1, y + h - 1])
        dets_by_img[img_id] = np.asarray(rows[:dets_per_img], float)
    ann_file = os.path.join(root, "instances_bench.json")
    with open(ann_file, "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": k, "name": f"c{k}"}
                                  for k in range(1, 81)]}, f)
    return ann_file, dets_by_img


def run(ann_file, dets_by_img, image_ids):
    from relation_tpu.data.coco import CocoDataset
    from relation_tpu.data.eval import CocoEvaluator
    ds = CocoDataset(ann_file)
    ds.image_ids = list(image_ids)
    ev = CocoEvaluator(ds)
    for img_id in image_ids:
        ev.add_detections(img_id, dets_by_img[img_id])
    t0 = time.perf_counter()
    res = ev.summarize()
    return time.perf_counter() - t0, res


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=5000)
    p.add_argument("--dets", type=int, default=300)
    p.add_argument("--python-fallback", action="store_true")
    p.add_argument("--n-py", type=int, default=100)
    args = p.parse_args()

    with tempfile.TemporaryDirectory(prefix="bench_eval_sum_") as root:
        print(f"synthesizing {args.n} images x {args.dets} dets ...",
              flush=True)
        ann_file, dets = synth(root, args.n, args.dets)
        ids = list(range(1, args.n + 1))

        dt, res = run(ann_file, dets, ids)
        print(json.dumps({
            "metric": "coco_summarize_wall", "value": dt, "unit": "s",
            "n_images": args.n, "dets_per_image": args.dets,
            "AP": round(res["AP"], 4), "AR100": round(res["AR100"], 4)}))

        if args.python_fallback:
            import relation_tpu.utils.native as native
            ids_py = ids[:args.n_py]
            dt_n, res_n = run(ann_file, dets, ids_py)
            lib = native._lib
            native._lib = False          # force the pure-Python matcher
            try:
                dt_p, res_p = run(ann_file, dets, ids_py)
            finally:
                native._lib = lib
            assert abs(res_n["AP"] - res_p["AP"]) < 1e-12, \
                (res_n["AP"], res_p["AP"])
            print(f"subset n={args.n_py}: native {dt_n:.2f}s vs "
                  f"python {dt_p:.2f}s ({dt_p / dt_n:.1f}x), AP identical")


if __name__ == "__main__":
    main()
