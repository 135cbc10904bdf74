"""End-to-end eval throughput FROM JPEG FILES on the real TPU chip.

The 253 img/s figure in tools/microbench_throughput.py feeds pre-staged
device-shaped arrays; this bench runs the HONEST pipeline the reference times
(core/tester.py:283-295): JPEG decode -> resize/mean-sub -> s2d relayout (in
the TestLoader worker pool) -> jitted predict -> async D2H -> drain, via the
production pred_eval loop. Reports wall-clock img/s over the whole set.

Usage: python tools/bench_eval_files.py [--n 256] [--workers 4] [--tiny]
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


def make_dataset(root: str, n: int, rng) -> tuple[str, str]:
    """n JPEGs at COCO-ish sizes + a minimal instances json."""
    from PIL import Image
    imdir = os.path.join(root, "images", "bench")
    os.makedirs(imdir, exist_ok=True)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    images, anns = [], []
    for i in range(n):
        # landscape ~640x426 like COCO; short side scales to 600 -> 608x1024 bucket
        w, h = 640, int(rng.uniform(400, 470))
        arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        name = f"b{i:05d}.jpg"
        Image.fromarray(arr).save(os.path.join(imdir, name), quality=90)
        images.append({"id": i + 1, "file_name": name, "width": w, "height": h})
        anns.append({"id": i + 1, "image_id": i + 1, "category_id": 1,
                     "bbox": [10, 10, 100, 80], "area": 8000, "iscrowd": 0})
    ann_file = os.path.join(root, "annotations", "instances_bench.json")
    with open(ann_file, "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": k, "name": f"c{k}"}
                                  for k in range(1, 81)]}, f)
    return ann_file, imdir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    import jax
    from relation_tpu.config.defaults import load_config
    from relation_tpu.core.trainer import build_model
    from relation_tpu.core.evaluator import pred_eval
    from relation_tpu.data.coco import CocoDataset
    from relation_tpu.data.loader import TestLoader

    cfg = load_config(os.path.join(
        os.path.dirname(__file__), "..", "experiments", "cfgs",
        "resnet_v1_101_coco_trainvalminus_rcnn_end2end_relation_learn_nms_"
        "8epoch.yaml"))
    cfg.dataset.test_image_set = "bench"
    cfg.TPU.EVAL_LOG_EVERY = 32          # per-stage telemetry on short runs

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory(prefix="bench_eval_") as root:
        ann_file, imdir = make_dataset(root, args.n, rng)
        dataset = CocoDataset(ann_file, imdir)
        roidb = dataset.roidb()

        model = build_model(cfg, tiny=args.tiny)
        import jax.numpy as jnp
        n0 = max(int(cfg.TEST.FIRST_N) + 1, 8)
        rois0 = jnp.tile(jnp.asarray([[0.0, 0.0, 32.0, 32.0]]), (n0, 1))
        params = jax.jit(model.init, static_argnums=(4,))(
            jax.random.PRNGKey(0), jnp.zeros((608, 1024, 3)), rois0,
            jnp.asarray([608.0, 1024.0, 1.0]), n0)["params"]

        # warmup: one image end to end; share the compiled-fn cache with the
        # timed run (pred_eval compiles once per image bucket per dict)
        fns: dict = {}
        loader_w = TestLoader(roidb[:1], cfg, num_workers=args.workers)
        pred_eval(model, params, cfg, dataset, roidb[:1], loader=loader_w,
                  predict_fns=fns)

        loader = TestLoader(roidb, cfg, num_workers=args.workers)
        t0 = time.perf_counter()
        pred_eval(model, params, cfg, dataset, roidb, loader=loader,
                  predict_fns=fns)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "eval_throughput_from_files", "value": args.n / dt,
            "unit": "img/s", "n": args.n, "workers": args.workers,
            "wall_s": dt}))


if __name__ == "__main__":
    main()
