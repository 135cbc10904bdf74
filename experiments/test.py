"""Evaluation driver (reference surface: relation_rcnn/test.py:23-79).

Usage:
  python experiments/test.py --cfg experiments/cfgs/<name>.yaml
      [--ckpt path] [--thresh 1e-3] [--softnms] [--naive-nms] [--first-n N]
      [--ignore-cache] [--vis-dir DIR]

Flags mutate TEST config like the reference CLI (test.py:31-53), then run
pred_eval (detections cache + COCO mAP).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description="Test Relation R-CNN (TPU)")
    p.add_argument("--cfg", required=True)
    p.add_argument("--ckpt", default="")
    p.add_argument("--thresh", type=float, default=1e-3)
    p.add_argument("--softnms", action="store_true")
    p.add_argument("--naive-nms", action="store_true",
                   help="force greedy NMS (disable learned NMS)")
    p.add_argument("--first-n", type=int, default=0)
    p.add_argument("--test-set", default="")
    p.add_argument("--ignore-cache", action="store_true")
    p.add_argument("--nms", type=float, default=0.0,
                   help="override TEST.NMS threshold")
    p.add_argument("--merge", type=int, default=-10,
                   help="override TEST.MERGE_METHOD (-1 mean, -2 max, >=0 index)")
    p.add_argument("--vis", action="store_true",
                   help="write detection renderings next to the cache")
    p.add_argument("--shuffle", action="store_true",
                   help="shuffle image order (reference test.py:43 — affects "
                        "visualization sampling; mAP is order-invariant)")
    p.add_argument("--debug", action="store_true",
                   help="enable in-graph monitor taps on the predict path "
                        "(reference test.py:43 --debug / operator_py/"
                        "monitor_op.py); logs per-image tensor stats")
    p.add_argument("--test-epoch", type=int, default=0,
                   help="epoch checkpoint to evaluate (reference test.py:44): "
                        "resolves output/<cfg>/<train set>/<model_prefix>-"
                        "EEEE.params.msgpack; --ckpt wins when both are given; "
                        "0 falls back to cfg.TEST.test_epoch when --ckpt is "
                        "absent and that checkpoint exists")
    p.add_argument("--dataset-path", default="",
                   help="override cfg.dataset.dataset_path")
    p.add_argument("--tiny", action="store_true",
                   help="tiny backbone (must match how the ckpt was trained)")
    p.add_argument("--roi-method", default="auto",
                   choices=("auto", "align", "pool"),
                   help="ROI feature extraction; auto = exact ROIPooling for "
                        "converted reference checkpoints (their head was "
                        "trained against MXNet ROIPooling), else cfg default")
    # tolerate ONLY the sibling driver's flags: rcnn_end2end_train_test.py
    # forwards one argv to both train and test (reference surface has no args).
    # Anything else (e.g. a typoed --thres) is a hard error.
    p.add_argument("--synthetic", type=int, default=0, help=argparse.SUPPRESS)
    p.add_argument("--steps", type=int, default=0, help=argparse.SUPPRESS)
    return p.parse_args()


def resolve_proposal_file(cfg, cfg_name: str) -> str:
    """Locate cached proposals for TEST.HAS_RPN=false (the reference test.py
    surface: function/test_rcnn.py:40-51 + lib/dataset/imdb.py:105-107 —
    head-only inference on cached proposals, the workflow the reference FPN
    configs ship with). Resolution order: the reference's
    ``<proposal_cache>/rpn_data/<set>_rpn.pkl`` layout, a flat
    ``<proposal_cache>/<set>_rpn.pkl``, then the pkl
    experiments/rcnn_train_test.py writes next to this config's train outputs.
    """
    s_test = cfg.dataset.test_image_set
    candidates = [
        os.path.join(cfg.dataset.proposal_cache or "", "rpn_data",
                     f"{s_test}_rpn.pkl"),
        os.path.join(cfg.dataset.proposal_cache or "", f"{s_test}_rpn.pkl"),
        os.path.join(cfg.output_path or "output", cfg_name,
                     cfg.dataset.image_set, f"{s_test}_rpn.pkl"),
    ]
    found = next((c for c in candidates if os.path.exists(c)), None)
    if found is None:
        raise FileNotFoundError(
            f"TEST.HAS_RPN=false needs cached proposals for '{s_test}'; "
            f"looked in: {candidates}. Generate them with "
            "experiments/rcnn_train_test.py (stage 2) or set "
            "TEST.HAS_RPN=true to use this model's own RPN.")
    return found


def main():
    args = parse_args()
    import jax
    import numpy as np
    from relation_tpu.config.defaults import load_config
    from relation_tpu.core.trainer import build_model
    from relation_tpu.core.checkpoint import read_params_blob, params_from_blob
    from relation_tpu.core.evaluator import pred_eval
    from relation_tpu.data.coco import CocoDataset, filter_roidb
    from relation_tpu.utils.logging import create_logger

    cfg = load_config(args.cfg)
    if args.softnms:
        cfg.TEST.SOFTNMS = True
    if args.naive_nms:
        cfg.TEST.LEARN_NMS = False
    if args.first_n:
        cfg.TEST.FIRST_N = args.first_n
    if args.test_set:
        cfg.dataset.test_image_set = args.test_set
    if args.dataset_path:
        cfg.dataset.dataset_path = args.dataset_path
    cfg.TEST.SCORE_THRESH = args.thresh
    if args.nms:
        cfg.TEST.NMS = args.nms
    if args.merge != -10:
        cfg.TEST.MERGE_METHOD = args.merge
    if args.debug:
        cfg.TPU.DEBUG_MONITOR = True
    if not args.ckpt:
        # reference --test_epoch convention (test.py:44,75): the checkpoint the
        # train driver wrote for that epoch under the TRAIN image_set dir
        epoch = args.test_epoch or int(cfg.TEST.test_epoch)
        if epoch:
            cfg_name_ = os.path.splitext(os.path.basename(args.cfg))[0]
            prefix = os.path.join(cfg.output_path or "output", cfg_name_,
                                  cfg.dataset.image_set,
                                  cfg.TRAIN.model_prefix or "model")
            cand = f"{prefix}-{epoch:04d}.params.msgpack"
            if args.test_epoch and not os.path.exists(cand):
                raise FileNotFoundError(f"--test-epoch {epoch}: {cand}")
            if os.path.exists(cand):
                args.ckpt = cand
    ckpt_blob = None
    if args.ckpt:
        # ONE deserialization of a (possibly multi-GB) checkpoint: the blob is
        # held and finished into the params template after the model exists
        ckpt_blob, meta = read_params_blob(args.ckpt)
    if args.roi_method != "auto":
        cfg.TPU.ROI_METHOD = args.roi_method
    elif args.ckpt and meta.get("roi_method"):
        # converted reference weights carry a __meta__ tag: evaluate them with
        # exact MXNet ROIPooling semantics (ops/roi_pool.py::roi_pool) — the
        # reference head is rounding max-pool (resnet_v1_101_rcnn_base.py:790)
        cfg.TPU.ROI_METHOD = meta["roi_method"]
        print(f"checkpoint meta: roi_method={meta['roi_method']} "
              f"(source={meta.get('source', '?')})")
        if meta["roi_method"] == "pool":
            # full parity mode: exact pre-NMS top-k for FPN proposals, f32
            # geometric-bias sinusoid, f32 deformable-PSROI pooling, and the
            # single dense attention path (the compact-gather lax.cond branch
            # tiles its einsums over m classes instead of C — last-ulp
            # differences per image)
            cfg.TPU.FPN_TOPK = "exact"
            cfg.TPU.GEOM_EMB_DTYPE = "float32"
            cfg.TPU.NMS_COMPACT_CLASSES = 0
            cfg.TPU.DCN_POOL_DTYPE = "float32"

    from relation_tpu.utils.compile_cache import enable_from_env_or_cfg
    enable_from_env_or_cfg(cfg)
    cfg_name = os.path.splitext(os.path.basename(args.cfg))[0]
    logger, out_path = create_logger(cfg.output_path or "output", cfg_name,
                                     cfg.dataset.test_image_set)

    s = cfg.dataset.test_image_set
    ann = os.path.join(cfg.dataset.dataset_path, "annotations",
                       f"instances_{s}.json")
    img_root = os.path.join(cfg.dataset.dataset_path, "images", s)
    dataset = CocoDataset(ann, img_root)
    roidb = dataset.roidb()
    if args.shuffle:
        # reference TestLoader(shuffle=True) (function/test_rcnn.py:54):
        # randomizes traversal (and thus which images --vis renders); the
        # detections cache and COCO eval key on image id, so mAP is unchanged
        np.random.shuffle(roidb)

    proposal_file = None
    if not bool(cfg.TEST.HAS_RPN):
        proposal_file = resolve_proposal_file(cfg, cfg_name)
        logger.info(f"HAS_RPN=false: cached proposals from {proposal_file}")

    model = build_model(cfg, tiny=args.tiny)
    import jax.numpy as jnp
    n0 = max(int(cfg.TEST.FIRST_N) + 1, 8)
    rois0 = jnp.tile(jnp.asarray([[0.0, 0.0, 32.0, 32.0]]), (n0, 1))
    bh, bw = sorted(tuple(b) for b in cfg.TPU.IMAGE_BUCKETS)[0]
    # jit the flax init: eager init dispatches ~600 ops one by one (~5 min
    # through the async device tunnel); jitted it is one compile + ms run
    # (measured in core/trainer.py:406-409)
    params = jax.jit(model.init, static_argnums=(4,))(
        jax.random.PRNGKey(0), jnp.zeros((bh, bw, 3)), rois0,
        jnp.asarray([float(bh), float(bw), 1.0]), n0)["params"]
    if args.ckpt:
        params = params_from_blob(ckpt_blob, params)
        logger.info(f"loaded params: {args.ckpt}")

    cache = os.path.join(out_path, "detections.pkl")
    results, dets = pred_eval(model, params, cfg, dataset, roidb, logger,
                              cache_path=cache, ignore_cache=args.ignore_cache,
                              proposal_file=proposal_file)
    if args.vis:
        # reference --vis (test.py:32, tester.py vis_all_detection)
        from relation_tpu.utils.vis import draw_detections
        from relation_tpu.data.image import load_image_bgr
        vis_dir = os.path.join(out_path, "vis")
        os.makedirs(vis_dir, exist_ok=True)
        names = ["bg"] + list(dataset.class_names)
        for entry in roidb[:50]:
            d = dets.get(entry.get("image_id", entry["image"]))
            if d is None:
                continue
            im = load_image_bgr(entry["image"])
            draw_detections(
                im, d, names, thresh=max(args.thresh, 0.3),
                out_path=os.path.join(
                    vis_dir, os.path.basename(str(entry["image"])) + ".png"))
        logger.info(f"wrote visualizations: {vis_dir}")
    print(results)
    return results, dets


if __name__ == "__main__":
    main()
