"""Alternate training workflow driver (reference surface:
experiments/relation_rcnn/rcnn_train_test.py -> function/train_rpn.py,
function/test_rpn.py, function/train_rcnn.py, function/test_rcnn.py):

  1. train the RPN standalone
  2. dump proposals over the train set (<set>_rpn.pkl) + recall report
  3. train the RCNN head (incl. relation / learn-NMS branches when configured)
     on the cached proposals; bbox-target normalization stats come from the
     roidb when TRAIN.BBOX_NORMALIZATION_PRECOMPUTED is false
     (lib/bbox/bbox_regression.py:60-117)
  4. evaluate with the proposal-file path (TEST.HAS_RPN=false)

Usage:
  python experiments/rcnn_train_test.py --cfg experiments/cfgs/<fpn cfg>.yaml
      [--synthetic N | --dataset-path ROOT] [--steps K] [--tiny]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic images instead of a dataset")
    p.add_argument("--steps", type=int, default=0)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--dataset-path", default="",
                   help="override cfg.dataset.dataset_path (COCO layout)")
    p.add_argument("--train-shared", action="store_true",
                   help="freeze the RPN-shared trunk during the RCNN stage "
                        "via network.FIXED_PARAMS_SHARED (reference "
                        "function/train_rcnn.py:119-123 train_shared=True; "
                        "the classic alternating-training share step)")
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
                                                evaluate_recall,
                                                load_proposal_roidb,
                                                add_bbox_regression_stats)
    from relation_tpu.core.checkpoint import save_checkpoint, save_params
    from relation_tpu.utils.logging import create_logger, Speedometer

    cfg = load_config(args.cfg)
    if args.dataset_path:
        cfg.dataset.dataset_path = args.dataset_path
    cfg_name = os.path.splitext(os.path.basename(args.cfg))[0]
    logger, out_path = create_logger(cfg.output_path or "output", cfg_name,
                                     cfg.dataset.image_set)
    model = build_model(cfg, tiny=args.tiny)

    max_gt = int(cfg.TPU.MAX_GT)
    rng = np.random.RandomState(0)
    n_steps = args.steps or 10
    synthetic = bool(args.synthetic) or not args.dataset_path

    if synthetic:
        H, W = (128, 128) if args.tiny else tuple(sorted(
            tuple(b) for b in cfg.TPU.IMAGE_BUCKETS)[0])
        roidb = None
    else:
        from relation_tpu.data.coco import CocoDataset, filter_roidb
        s = cfg.dataset.image_set
        dataset = CocoDataset(
            os.path.join(cfg.dataset.dataset_path, "annotations",
                         f"instances_{s}.json"),
            os.path.join(cfg.dataset.dataset_path, "images", s))
        roidb = filter_roidb(dataset.roidb())
        H, W = tuple(sorted(tuple(b) for b in cfg.TPU.IMAGE_BUCKETS)[0])

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

    def real_batches():
        from relation_tpu.data.loader import TrainLoader
        while True:
            for b in TrainLoader(roidb, cfg, batch_size=1):
                yield b

    batch_src = real_batches() if not synthetic else None

    def next_batch():
        if synthetic:
            return synth_batch(1)
        b = dict(next(batch_src))
        return b

    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               jnp.zeros((H, W, 3)),
                               jnp.asarray([float(H), float(W), 1.0]))

    # ---- stage 1: RPN ----
    logger.info("stage 1: RPN training")
    rpn_step = jax.jit(make_train_step_rpn(model, cfg, max_gt=max_gt))
    speedo = Speedometer(logger, 1, max(n_steps // 5, 1))
    for i in range(n_steps):
        batch = jax.tree.map(jnp.asarray, next_batch())
        state, m = rpn_step(state, batch)
        speedo.update(0, i, jax.tree.map(float, m))

    # ---- stage 2: dump proposals (+ recall on real data) ----
    logger.info("stage 2: proposal generation")
    pkl = os.path.join(out_path, f"{cfg.dataset.image_set}_rpn.pkl")
    if synthetic:
        items = [(i, synth_batch(1)["image"][0],
                  np.asarray([H, W, 1.0], np.float32)) for i in range(4)]

        class L:
            def __iter__(self):
                return iter(items)

            def __len__(self):
                return len(items)

        generate_rpn_proposals(model, state.params, cfg, None, pkl, loader=L())
    else:
        generate_rpn_proposals(model, state.params, cfg, roidb, pkl)
        props = pickle.load(open(pkl, "rb"))
        rec = evaluate_recall(roidb, props)
        logger.info("proposal recall: AR(all)=%.3f  area-pct=%s"
                    % (rec["ar"], {k: round(v, 3)
                                   for k, v in rec["proposal_area_pct"].items()}))
    logger.info(f"proposals -> {pkl}")

    # ---- stage 3: RCNN on cached proposals ----
    logger.info("stage 3: RCNN training on cached proposals")
    props = pickle.load(open(pkl, "rb"))
    R = max(max((len(p) for p in props), default=1), 8)

    bbox_means = bbox_stds = None
    if not bool(cfg.TRAIN.BBOX_NORMALIZATION_PRECOMPUTED):
        if synthetic:
            logger.info("synthetic mode: no roidb; using cfg BBOX_MEANS/STDS")
        else:
            prop_roidb = load_proposal_roidb(roidb, pkl,
                                             top_rois=int(cfg.TRAIN.TOP_ROIS))
            means_k, stds_k = add_bbox_regression_stats(
                prop_roidb, int(cfg.dataset.NUM_CLASSES),
                bool(cfg.CLASS_AGNOSTIC),
                float(cfg.TRAIN.BBOX_REGRESSION_THRESH))
            bbox_means, bbox_stds = means_k[1], stds_k[1]
            logger.info("roidb bbox stats: means=%s stds=%s"
                        % (np.round(bbox_means, 4), np.round(bbox_stds, 4)))

    if args.train_shared:
        # new optimizer whose freeze mask is FIXED_PARAMS_SHARED (the
        # reference RCNN stage binds a fresh Module with fixed_param_prefix =
        # FIXED_PARAMS_SHARED, function/train_rcnn.py:119-136)
        from relation_tpu.core.trainer import refreeze_state
        state = refreeze_state(state, cfg, cfg.network.FIXED_PARAMS_SHARED)
        logger.info("stage 3 train_shared: frozen prefixes %s"
                    % list(cfg.network.FIXED_PARAMS_SHARED))
    rcnn_step = jax.jit(make_train_step_rcnn(model, cfg, max_rois=R,
                                             max_gt=max_gt,
                                             bbox_means=bbox_means,
                                             bbox_stds=bbox_stds,
                                             train_shared=args.train_shared))

    def rcnn_batch(i):
        """1-image batch paired with ITS cached proposals (scaled coords)."""
        if synthetic:
            b = synth_batch(1)
            p = props[i % len(props)]
            scale = 1.0
        else:
            from relation_tpu.data.loader import TrainLoader
            idx = i % len(roidb)
            tl = rcnn_batch.tl
            if tl is None:
                tl = rcnn_batch.tl = TrainLoader(roidb, cfg, batch_size=1,
                                                 num_prefetch=0)
            b = tl._make_batch([idx])
            p = props[idx]
            scale = float(b["im_info"][0][2])
        rois = np.zeros((1, R, 4), np.float32)
        rv = np.zeros((1, R), bool)
        n = min(len(p), R)
        if n:
            rois[0, :n] = p[:n, :4] * scale
            rv[0, :n] = True
        b.update(rois=rois, rois_valid=rv)
        return b

    rcnn_batch.tl = None
    for i in range(n_steps):
        state, m = rcnn_step(state, jax.tree.map(jnp.asarray, rcnn_batch(i)))
        speedo.update(1, i, jax.tree.map(float, m))

    save_checkpoint(os.path.join(out_path, "rcnn_alt-final.ckpt"), state)
    save_params(os.path.join(out_path, "rcnn_alt-final.params.msgpack"),
                state.params)
    logger.info("alternate workflow done; total_loss=%.4f"
                % float(m["total_loss"]))

    # ---- stage 4: eval via the proposal-file path (TEST.HAS_RPN=false) ----
    if not synthetic:
        from relation_tpu.core.predictor import make_predict_fn_rcnn
        from relation_tpu.core.evaluator import pred_eval_rcnn
        s_test = cfg.dataset.test_image_set
        test_ann = os.path.join(cfg.dataset.dataset_path, "annotations",
                                f"instances_{s_test}.json")
        if os.path.exists(test_ann):
            from relation_tpu.data.coco import CocoDataset
            test_ds = CocoDataset(
                test_ann, os.path.join(cfg.dataset.dataset_path, "images",
                                       s_test))
            test_roidb = test_ds.roidb()
            test_pkl = os.path.join(out_path, f"{s_test}_rpn.pkl")
            generate_rpn_proposals(model, state.params, cfg, test_roidb,
                                   test_pkl)
            results, _ = pred_eval_rcnn(
                model, state.params, cfg, test_ds, test_roidb, test_pkl,
                logger, cache_path=os.path.join(out_path, "detections.pkl"),
                ignore_cache=True)
            logger.info(f"stage 4 eval: {results}")
        else:
            logger.info(f"no test annotations at {test_ann}; skipping stage 4")


if __name__ == "__main__":
    main()
