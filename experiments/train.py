"""End-to-end training driver (reference surface: relation_rcnn/train_end2end.py).

Usage:
  python experiments/train.py --cfg experiments/cfgs/<name>.yaml [--synthetic N]

--synthetic N trains on N random images (shape/loss plumbing demo) when no COCO
data is mounted; otherwise cfg.dataset.* points at COCO annotation/image paths
(image_set entries joined by '+', reference train_end2end.py:90-96).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Train Relation R-CNN (TPU)")
    p.add_argument("--cfg", required=True)
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic images instead of COCO")
    p.add_argument("--steps", type=int, default=0,
                   help="cap total optimizer steps (0 = full schedule)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny backbone (debug)")
    # tolerate ONLY the sibling driver's flags: rcnn_end2end_train_test.py
    # forwards one argv to both train and test (reference surface has no args).
    # Anything else (e.g. a typoed --step) is a hard error.
    for flag in ("--ckpt", "--test-set", "--dataset-path"):
        p.add_argument(flag, default="", help=argparse.SUPPRESS)
    p.add_argument("--thresh", type=float, default=0.0, help=argparse.SUPPRESS)
    p.add_argument("--nms", type=float, default=0.0, help=argparse.SUPPRESS)
    for flag in ("--softnms", "--naive-nms", "--ignore-cache", "--vis"):
        p.add_argument(flag, action="store_true", help=argparse.SUPPRESS)
    p.add_argument("--first-n", type=int, default=0, help=argparse.SUPPRESS)
    p.add_argument("--merge", type=int, default=-10, help=argparse.SUPPRESS)
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    from relation_tpu.config.defaults import load_config
    from relation_tpu.core.trainer import (build_model, create_train_state,
                                           make_train_step)
    from relation_tpu.core.checkpoint import (save_checkpoint, save_params,
                                              restore_checkpoint)
    from relation_tpu.parallel.mesh import make_mesh, shard_batch, replicated
    from relation_tpu.utils.logging import create_logger, Speedometer

    cfg = load_config(args.cfg)
    from relation_tpu.utils.compile_cache import enable_from_env_or_cfg
    enable_from_env_or_cfg(cfg)
    cfg_name = os.path.splitext(os.path.basename(args.cfg))[0]
    logger, out_path = create_logger(cfg.output_path or "output", cfg_name,
                                     cfg.dataset.image_set)
    logger.info(f"config: {args.cfg}")
    # reference train_end2end.py:64,74-75: source/config snapshot into the run
    # dir + full config into the log (the YAML is our symbol-source analogue —
    # the model is chosen by cfg.symbol from the registry, not an eval'd file)
    import pprint
    import shutil
    try:
        shutil.copy2(args.cfg, out_path)
    except (OSError, shutil.SameFileError):
        pass
    logger.info("training config:\n" + pprint.pformat(cfg))

    np.random.seed(0)
    model = build_model(cfg, tiny=args.tiny)

    n_dev = len(jax.devices())
    batch_size = int(cfg.TRAIN.BATCH_IMAGES) * n_dev
    mesh = make_mesh(n_data=n_dev)

    if args.synthetic:
        H, W = (128, 128) if args.tiny else tuple(cfg.TPU.IMAGE_BUCKETS[0])
        max_gt = int(cfg.TPU.MAX_GT)
        rng = np.random.RandomState(0)

        def batches(epoch):
            for _ in range(max(args.synthetic // batch_size, 1)):
                gt = np.zeros((batch_size, max_gt, 5), np.float32)
                gv = np.zeros((batch_size, max_gt), bool)
                for b in range(batch_size):
                    g = rng.randint(1, 5)
                    for i in range(g):
                        x1, y1 = rng.uniform(0, W // 2), rng.uniform(0, H // 2)
                        gt[b, i] = [x1, y1, x1 + rng.uniform(16, W // 3),
                                    y1 + rng.uniform(16, H // 3),
                                    rng.randint(1, cfg.dataset.NUM_CLASSES)]
                    gv[b, :g] = True
                yield {
                    "image": rng.randn(batch_size, H, W, 3).astype(np.float32),
                    "im_info": np.tile(np.asarray([[H, W, 1.0]], np.float32),
                                       (batch_size, 1)),
                    "gt_boxes": gt, "gt_valid": gv,
                }
        epoch_size = max(args.synthetic // batch_size, 1)
        feat_hw0 = (H // 16, W // 16)
        sample_image = jnp.zeros((H, W, 3))
    else:
        from relation_tpu.data.coco import CocoDataset, filter_roidb
        from relation_tpu.data.loader import TrainLoader
        sets = cfg.dataset.image_set.split("+")
        roidb = []
        for s in sets:
            ann = os.path.join(cfg.dataset.dataset_path, "annotations",
                               f"instances_{s}.json")
            img_root = os.path.join(cfg.dataset.dataset_path, "images", s)
            ds = CocoDataset(ann, img_root)
            roidb += ds.roidb(flip=bool(cfg.TRAIN.FLIP))
        roidb = filter_roidb(roidb)
        logger.info(f"roidb size: {len(roidb)}")
        loader = TrainLoader(roidb, cfg, batch_size)
        epoch_size = len(loader)
        bh, bw = sorted(tuple(b) for b in cfg.TPU.IMAGE_BUCKETS)[0]
        feat_hw0 = (bh // 16, bw // 16)
        sample_image = jnp.zeros((bh, bw, 3))

        def batches(epoch):
            yield from loader

    state = create_train_state(model, cfg, jax.random.PRNGKey(0), sample_image,
                               jnp.asarray([sample_image.shape[0],
                                            sample_image.shape[1], 1.0]),
                               epoch_size=epoch_size)
    state = jax.device_put(state, replicated(mesh))

    model_prefix = os.path.join(out_path, cfg.TRAIN.model_prefix or "model")
    begin_epoch = int(cfg.TRAIN.begin_epoch)
    if cfg.TRAIN.RESUME:
        ckpt = f"{model_prefix}-{begin_epoch:04d}.ckpt"
        state = restore_checkpoint(ckpt, state)
        logger.info(f"resumed from {ckpt}")

    step_fns = {}
    speedo = Speedometer(logger, batch_size, int(cfg.default.frequent))
    total_steps = 0
    for epoch in range(begin_epoch, int(cfg.TRAIN.end_epoch)):
        for i, batch in enumerate(batches(epoch)):
            from relation_tpu.data.image import batch_image_hw
            ih, iw = batch_image_hw(batch["image"])
            fh = ih // int(cfg.network.RPN_FEAT_STRIDE)
            fw = iw // int(cfg.network.RPN_FEAT_STRIDE)
            if (fh, fw) not in step_fns:
                step_fns[(fh, fw)] = jax.jit(make_train_step(model, cfg))
            sb = shard_batch(mesh, batch)
            with mesh:
                state, metrics = step_fns[(fh, fw)](state, sb)
            speedo.update(epoch, i, jax.tree.map(float, metrics))
            total_steps += 1
            if args.steps and total_steps >= args.steps:
                break
        # full resume blob + a params-only file for the eval path; the pair
        # mirrors the reference's module_checkpoint(.states) + do_checkpoint
        # params files (train_end2end.py:151-152)
        save_checkpoint(f"{model_prefix}-{epoch + 1:04d}.ckpt", state)
        save_params(f"{model_prefix}-{epoch + 1:04d}.params.msgpack",
                    state.params)
        logger.info(f"saved checkpoint epoch {epoch + 1}")
        if args.steps and total_steps >= args.steps:
            break
    logger.info("training done")


if __name__ == "__main__":
    main()
