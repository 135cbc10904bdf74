"""Standalone timing of anchor_targets (models/targets.py::anchor_targets).

The train-step cumulative cuts put the anchor_targets stage at 2.2-2.5 ms/img
(tools/microbench_train_cuts.py) for a 38x64x9=21888-anchor C4 grid — ~100x
the arithmetic cost of the [K, G] IoU matrix + two top_k(22k) it performs.
This bench times the op in isolation (it consumes NO network outputs, so its
in-context cost IS its standalone cost plus layout glue) and, with --cuts,
truncated variants to locate the hot op.

Usage: python tools/microbench_anchor_targets.py [--cuts]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from relation_tpu.models.targets import anchor_targets
from relation_tpu.ops.anchors import generate_anchors, shift_anchors
from relation_tpu.ops.boxes import bbox_overlaps, bbox_transform
from tools.microbench import timeit_us


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cuts", action="store_true")
    p.add_argument("--fh", type=int, default=38)
    p.add_argument("--fw", type=int, default=64)
    args = p.parse_args()

    base = generate_anchors(16, (0.5, 1, 2), (4, 8, 16, 32))[:9]
    anchors = shift_anchors(base, args.fh, args.fw, 16)
    K = anchors.shape[0]
    G = 100
    rng = np.random.default_rng(0)
    g = np.zeros((G, 5), np.float32)
    g[:, 0] = rng.uniform(0, 900, G); g[:, 1] = rng.uniform(0, 500, G)
    g[:, 2] = g[:, 0] + rng.uniform(20, 120, G)
    g[:, 3] = g[:, 1] + rng.uniform(20, 100, G)
    g[:, 4] = rng.integers(1, 81, G)
    gt = jnp.asarray(g)
    gv = jnp.asarray(np.arange(G) < 7)
    im_info = jnp.asarray([608.0, 1024.0, 1.0])
    key = jax.random.PRNGKey(0)

    def full(gtb):
        l, t, w = anchor_targets(anchors, gtb, gv, im_info, key)
        return t + w + l[:, None].astype(jnp.float32)

    us = timeit_us(full, gt, n=50)
    print(f"anchor_targets full       K={K}: {us:8.1f} us")

    if not args.cuts:
        return

    def cut_iou(gtb):
        ov = bbox_overlaps(anchors, gtb[:, :4])
        return jnp.max(ov, axis=1)[:, None] + jnp.argmax(ov, axis=1)[:, None]

    def cut_labels(gtb):
        inside = ((anchors[:, 0] >= 0) & (anchors[:, 1] >= 0) &
                  (anchors[:, 2] < im_info[1]) & (anchors[:, 3] < im_info[0]))
        ov = bbox_overlaps(anchors, gtb[:, :4])
        ov = jnp.where(gv[None, :], ov, -1.0)
        ov = jnp.where(inside[:, None], ov, -1.0)
        mx = jnp.maximum(jnp.max(ov, axis=1), 0.0)
        gt_max = jnp.max(ov, axis=0)
        best = jnp.any((ov == gt_max[None, :]) & gv[None, :]
                       & (gt_max[None, :] > 0), axis=1)
        lab = jnp.where(mx < 0.3, 0, -1)
        lab = jnp.where(best | (mx >= 0.7), 1, lab)
        return lab[:, None].astype(jnp.float32) + mx[:, None]

    def cut_sample(gtb):
        # labels + the two _keep_top subsample passes, no bbox targets
        l, t, w = anchor_targets(anchors, gtb, gv, im_info, key)
        return l[:, None].astype(jnp.float32)

    def cut_transform(gtb):
        ov = bbox_overlaps(anchors, gtb[:, :4])
        am = jnp.argmax(ov, axis=1)
        return bbox_transform(anchors, gtb[am, :4])

    for name, fn in [("iou+max", cut_iou), ("labels", cut_labels),
                     ("labels+sample(slice-DCE'd tgt)", cut_sample),
                     ("gather+bbox_transform", cut_transform)]:
        us = timeit_us(fn, gt, n=50)
        print(f"anchor_targets cut {name:<30}: {us:8.1f} us")


if __name__ == "__main__":
    main()
