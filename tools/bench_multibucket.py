"""Multi-bucket eval on the real chip: per-bucket XLA compile cost + steady-state
throughput when the image stream crosses all 3 TPU.IMAGE_BUCKETS.

Round-2 verdict gap: every bench exercised exactly one bucket (608x1024); real
COCO eval hits all of [(608,1024), (800,1024), (1024,1024)] and the static-shape
design pays one XLA compile per bucket where the reference pays a cheap executor
rebind (core/module.py:1041-1074). Two mitigations, both measured here:
- THREADED PREWARM (core/evaluator.prewarm_buckets, TPU.PREWARM_BUCKETS=True):
  XLA compilation is mostly off-GIL and much of the per-bucket first call is
  tunnel RPC waiting, so firing all three compiles from threads overlaps them
  (77.7 s serial -> 45.6 s, tools/bench_prewarm.py) — pred_eval now does this
  automatically, so the cold pass below measures the prewarmed pipeline.
- the PERSISTENT compilation cache (cfg.TPU.COMPILE_CACHE_DIR): helps only on
  hosts where deserialization beats recompile — measured NOT to help through
  this environment's tunnel (see BASELINE.md round 3), kept for CPU/tests.

This tool measures, in the production pred_eval loop on a mixed-aspect synthetic
JPEG dataset:
- pass 1 (cold):   compiles land mid-stream on the first image of each bucket
- pass 2 (steady): same stream, compiled fns reused -> steady-state mixed img/s
- per-bucket compile seconds (first-call latency attribution from pass 1)
- with --cache-dir: re-exec a fresh process and time its cold pass against the
  populated on-disk cache

Usage: python tools/bench_multibucket.py [--n 96] [--cache-dir /tmp/xc]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# (w, h) source sizes whose short-side-600 resize lands in each bucket
# (data/image.py::pick_bucket over cfg.TPU.IMAGE_BUCKETS):
#   640x426 -> 600x901 -> (608, 1024)
#   640x750 -> 703x600 -> (800, 1024)
#   640x900 -> 844x600 -> (1024, 1024)
BUCKET_SOURCES = {(608, 1024): (640, 426), (800, 1024): (640, 750),
                  (1024, 1024): (640, 900)}


def make_dataset(root: str, n: int, rng) -> tuple[str, str]:
    """n JPEGs cycling through the 3 bucket profiles + minimal instances json."""
    from PIL import Image
    imdir = os.path.join(root, "images", "bench")
    os.makedirs(imdir, exist_ok=True)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    sizes = list(BUCKET_SOURCES.values())
    images, anns = [], []
    for i in range(n):
        w, h = sizes[i % len(sizes)]
        arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        name = f"m{i:05d}.jpg"
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


class TimingFns(dict):
    """predict_fns dict that wraps each compiled fn to time its FIRST call
    (jit compile happens inside that call)."""

    def __init__(self):
        super().__init__()
        self.first_call_s: dict = {}

    def __setitem__(self, key, fn):
        def timed(*a, _key=key, _fn=fn, **kw):
            if _key not in self.first_call_s:
                t0 = time.perf_counter()
                out = _fn(*a, **kw)
                np.asarray(out["dets"])
                self.first_call_s[_key] = time.perf_counter() - t0
                return out
            return _fn(*a, **kw)
        super().__setitem__(key, timed)


def run_passes(n: int, workers: int, tiny: bool, dataset_root: str):
    import jax
    import jax.numpy as jnp
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
    cfg.TPU.EVAL_LOG_EVERY = 32

    ann_file = os.path.join(dataset_root, "annotations",
                            "instances_bench.json")
    imdir = os.path.join(dataset_root, "images", "bench")
    dataset = CocoDataset(ann_file, imdir)
    roidb = dataset.roidb()

    model = build_model(cfg, tiny=tiny)
    n0 = max(int(cfg.TEST.FIRST_N) + 1, 8)
    rois0 = jnp.tile(jnp.asarray([[0.0, 0.0, 32.0, 32.0]]), (n0, 1))
    params = jax.jit(model.init, static_argnums=(4,))(
        jax.random.PRNGKey(0), jnp.zeros((608, 1024, 3)), rois0,
        jnp.asarray([608.0, 1024.0, 1.0]), n0)["params"]

    out = {}
    fns = TimingFns()
    for label in ("cold", "steady"):
        loader = TestLoader(roidb, cfg, num_workers=workers)
        t0 = time.perf_counter()
        pred_eval(model, params, cfg, dataset, roidb, loader=loader,
                  predict_fns=fns)
        wall = time.perf_counter() - t0
        out[label] = {"wall_s": round(wall, 2),
                      "img_per_s": round(n / wall, 2)}
        print(f"[{label}] wall {wall:.1f}s  {n / wall:.2f} img/s", flush=True)
    out["first_call_s"] = {f"{k[0] * 16}x{k[1] * 16}": round(v, 1)
                           for k, v in fns.first_call_s.items()}
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=96)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--cache-dir", default="",
                   help="persistent XLA cache dir; runs a third, fresh-process "
                        "cold pass against the populated cache")
    p.add_argument("--_child", action="store_true", help=argparse.SUPPRESS)
    p.add_argument("--_root", default="", help=argparse.SUPPRESS)
    args = p.parse_args()

    if args.cache_dir:
        os.environ.setdefault("RELATION_TPU_COMPILE_CACHE", args.cache_dir)
        from relation_tpu.utils.compile_cache import enable_compile_cache
        enable_compile_cache(args.cache_dir)

    if args._child:
        res = run_passes(args.n, args.workers, args.tiny, args._root)
        print("CHILD_RESULT " + json.dumps(res), flush=True)
        return

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory(prefix="bench_mb_") as root:
        make_dataset(root, args.n, rng)
        results = run_passes(args.n, args.workers, args.tiny, root)

        if args.cache_dir:
            # fresh process, warm on-disk cache: the production re-run path
            cmd = [sys.executable, os.path.abspath(__file__), "--_child",
                   "--_root", root, "--n", str(args.n),
                   "--workers", str(args.workers),
                   "--cache-dir", args.cache_dir]
            if args.tiny:
                cmd.append("--tiny")
            cp = subprocess.run(cmd, capture_output=True, text=True,
                                timeout=3600)
            for line in cp.stdout.splitlines():
                if line.startswith("CHILD_RESULT "):
                    results["fresh_process_warm_cache"] = json.loads(
                        line[len("CHILD_RESULT "):])
            if "fresh_process_warm_cache" not in results:
                print(cp.stdout[-2000:], cp.stderr[-2000:])

        print(json.dumps({"metric": "multibucket_eval", "n": args.n,
                          "results": results}))


if __name__ == "__main__":
    main()
