"""End-to-end TRAIN throughput FROM JPEG FILES on the real TPU chip.

The 25.8 ms/step figure in tools/microbench_train.py feeds pre-staged
device-shaped arrays; this bench runs the HONEST training pipeline the
reference times (train_end2end.py with PrefetchingIterV2's decode threads,
lib/utils/PrefetchingIter.py:19-150): JPEG decode -> resize/flip/s2d (in the
TrainLoader worker pool, uint8 H2D) -> full jitted train step (fwd+bwd+
targets+learned-NMS+SGD). The step chain carries a real data dependency
(state), so dispatch pipelines against host decode; the loss is fetched once
at the end.

Also reports the loader-only rate (same loader, no device work) so the wall
splits into host-decode vs device-bound time.

Usage: python tools/bench_train_files.py [--n 128] [--workers 4] [--batch 1]
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
    """n JPEGs at COCO-ish sizes + instances json WITH boxes (training needs
    gt; 3-8 objects/image like COCO's ~7 average)."""
    from PIL import Image
    imdir = os.path.join(root, "images", "bench")
    os.makedirs(imdir, exist_ok=True)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    images, anns = [], []
    aid = 0
    for i in range(n):
        w, h = 640, int(rng.uniform(400, 470))
        arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        name = f"b{i:05d}.jpg"
        Image.fromarray(arr).save(os.path.join(imdir, name), quality=90)
        images.append({"id": i + 1, "file_name": name, "width": w, "height": h})
        for _ in range(int(rng.integers(3, 9))):
            x = float(rng.uniform(0, w - 60))
            y = float(rng.uniform(0, h - 60))
            bw = float(rng.uniform(20, min(200, w - x)))
            bh = float(rng.uniform(20, min(200, h - y)))
            aid += 1
            anns.append({"id": aid, "image_id": i + 1,
                         "category_id": int(rng.integers(1, 81)),
                         "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0})
    ann_file = os.path.join(root, "annotations", "instances_bench.json")
    with open(ann_file, "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": k, "name": f"c{k}"}
                                  for k in range(1, 81)]}, f)
    return ann_file, imdir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=128)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--batch", type=int, default=1)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_cfg
    from relation_tpu.core.trainer import (build_model, make_train_step,
                                           create_train_state)
    from relation_tpu.data.coco import CocoDataset, filter_roidb
    from relation_tpu.data.loader import TrainLoader

    cfg = _flagship_cfg()
    cfg.TRAIN.lr = 1e-5           # timing-run numerics (microbench_train.py)
    cfg.TRAIN.warmup = False
    cfg.TPU.GRAD_CLIP = 1.0

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory(prefix="bench_train_") as root:
        ann_file, imdir = make_dataset(root, args.n, rng)
        roidb = filter_roidb(CocoDataset(ann_file, imdir).roidb())

        model = build_model(cfg)
        H, W = 608, 1024
        state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   jnp.zeros((12, H // 2, W // 2)),
                                   jnp.asarray([float(H), float(W), 1.0]))
        jstep = jax.jit(make_train_step(model, cfg), donate_argnums=(0,))

        loader = TrainLoader(roidb, cfg, batch_size=args.batch,
                             num_workers=args.workers)

        # loader-only rate (fresh loader: no warm caches carried over)
        t0 = time.perf_counter()
        n_img = 0
        for b in TrainLoader(roidb, cfg, batch_size=args.batch,
                             num_workers=args.workers):
            n_img += b["image"].shape[0]
        data_dt = time.perf_counter() - t0

        # warm compile on the first batch
        it = iter(loader)
        first = next(it)
        state, m = jstep(state, jax.tree.map(jnp.asarray, first))
        float(np.asarray(m["total_loss"]))

        steps = 0
        t0 = time.perf_counter()
        for batch in it:
            state, m = jstep(state, jax.tree.map(jnp.asarray, batch))
            steps += 1
        loss = float(np.asarray(m["total_loss"]))
        dt = time.perf_counter() - t0
        n_timed = steps * args.batch
        print(f"loader-only: {n_img / data_dt:.1f} img/s "
              f"({1e3 * data_dt / n_img:.1f} ms/img, workers={args.workers})")
        print(json.dumps({
            "metric": "train_step_from_files", "value": 1e3 * dt / n_timed,
            "unit": "ms/img", "img_per_s": n_timed / dt, "batch": args.batch,
            "workers": args.workers, "n": n_timed, "loss": round(loss, 3),
            "loader_only_ms_per_img": round(1e3 * data_dt / n_img, 1)}))


if __name__ == "__main__":
    main()
