"""pred_eval equivalent: run the jitted predictor over a test set, cache
detections, report timing splits, and compute COCO mAP.

Mirrors core/tester.py:163-342: per-image loop with data/net/post timing telemetry,
a detections cache (pickle), then dataset evaluation — except the entire per-image
compute (backbone -> ... -> final padded detections) is one device call.
"""

from __future__ import annotations

import os
import pickle
import time

import numpy as np

from relation_tpu.core.predictor import make_predict_fn, prepare_res4_folded
from relation_tpu.data.eval import CocoEvaluator, format_coco_summary


def _build_predict_fn(model, cfg, feat_hw):
    """The per-bucket predict program pred_eval compiles on first sight of a
    bucket: the split module(s) for the FPN learned-NMS family
    (TPU.FPN_SPLIT_PREDICT: truthy = two-dispatch, 3 = three-dispatch with the
    Pallas proposal sweep + Pallas head/tail), one fused module otherwise."""
    from relation_tpu.models.fpn import RelationRCNNFPN
    split = cfg.TPU.get("FPN_SPLIT_PREDICT", False)
    if (bool(split) and isinstance(model, RelationRCNNFPN)
            and bool(cfg.TEST.LEARN_NMS)):
        # accept bool/int (and int-like strings from YAML/CLI overrides);
        # any other truthy value means "split on" -> the two-dispatch default
        try:
            split = int(split) if not isinstance(split, bool) else 1
        except (TypeError, ValueError):
            split = 1
        if int(split) >= 3:
            from relation_tpu.core.predictor import make_predict_fn_split3
            return make_predict_fn_split3(model, cfg, feat_hw)
        from relation_tpu.core.predictor import make_predict_fn_split
        return make_predict_fn_split(model, cfg, feat_hw)
    return make_predict_fn(model, cfg, feat_hw)


def prewarm_buckets(model, params, cfg, predict_fns, res4_folded=None,
                    logger=None, block=False):
    """Fire every bucket's first-call XLA compile from parallel threads.

    The reference pays ~nothing at startup (MutableModule rebinds executors,
    core/module.py:1041-1074); the static-bucket design here pays one XLA
    compile per image bucket, and through this environment's tunnel those are
    ~25-40 s EACH and the persistent compile cache does not help
    (tools/bench_multibucket.py). Compilation is mostly off-GIL (XLA C++), so
    three threads overlap it: measured 77.7 s serial -> 45.6 s threaded
    (1.70x, tools/bench_prewarm.py). The threads populate the SAME
    ``predict_fns`` jit cache pred_eval uses; the eval loop may start
    immediately — a real image landing on a still-compiling bucket simply
    blocks on that fn's trace lock instead of starting a serial compile.
    """
    import threading

    import jax
    import jax.numpy as jnp

    log = logger.info if logger else print
    stride = int(cfg.network.RCNN_FEAT_STRIDE)
    u8 = bool(cfg.TPU.get("H2D_UINT8", True))
    s2d = bool(cfg.TPU.get("S2D_INPUT", True))

    def warm_one(hw):
        H, W = int(hw[0]), int(hw[1])
        feat_hw = (H // stride, W // stride)
        fn = predict_fns.setdefault(feat_hw,
                                    _build_predict_fn(model, cfg, feat_hw))
        dtype = jnp.uint8 if u8 else jnp.float32
        img = (jnp.zeros((12, H // 2, W // 2), dtype) if s2d
               else jnp.zeros((H, W, 3), dtype))
        try:
            out = fn(params, img, jnp.asarray([float(H), float(W), 1.0]),
                     res4_folded)
            jax.block_until_ready(out["dets"])
        except Exception as e:  # surface on the real image instead
            log(f"prewarm bucket {hw} failed: {e!r}")

    threads = [threading.Thread(target=warm_one, args=(tuple(b),), daemon=True)
               for b in cfg.TPU.IMAGE_BUCKETS]
    t0 = time.time()
    for th in threads:
        th.start()
    if block:
        for th in threads:
            th.join()
        log(f"prewarmed {len(threads)} buckets in {time.time() - t0:.1f}s")
    return threads


def pred_eval(model, params, cfg, dataset, roidb, logger=None,
              cache_path: str | None = None, ignore_cache: bool = False,
              loader=None, proposal_file: str | None = None,
              predict_fns: dict | None = None, mesh=None):
    """Returns (results dict, dets_per_image). roidb entries need image/image_id.

    With ``proposal_file`` the reference's TEST.HAS_RPN=false path runs instead:
    head-only inference on cached proposals (function/test_rcnn.py:40-74).

    ``predict_fns``: optional {feat_hw: jitted fn} cache shared across calls —
    pass the same dict to successive pred_eval calls (e.g. a warmup pass then
    the timed set) to reuse compiled programs (one ~20 s XLA compile per image
    bucket otherwise repeats per call).

    ``mesh``: a jax.sharding.Mesh with >1 devices switches to data-parallel
    inference — images are grouped per bucket into batches of n_devices, one
    image per device (core/predictor.make_predict_fn_sharded; the reference's
    multi-GPU Predictor + _merge_multi_context batch-concat merge,
    core/tester.py:27-40 / DataParallelExecutorGroup.py:47-60). A final
    partial batch is padded by repetition and the pad outputs dropped;
    detections are identical to the sequential path per image."""
    import jax.numpy as jnp
    from relation_tpu.data.loader import TestLoader, ProposalTestLoader

    log = logger.info if logger else print
    if cache_path and os.path.exists(cache_path) and not ignore_cache:
        with open(cache_path, "rb") as f:
            dets_per_image = pickle.load(f)
        log(f"loaded detections cache: {cache_path}")
    else:
        if proposal_file:
            from relation_tpu.core.predictor import make_predict_fn_rcnn
            loader = loader or ProposalTestLoader(roidb, cfg, proposal_file)
            predict_rcnn = make_predict_fn_rcnn(model, cfg)
        else:
            loader = loader or TestLoader(roidb, cfg)
        predict_fns = {} if predict_fns is None else predict_fns
        # once per checkpoint: BN-fold the res4 stacks (None unless
        # cfg.TPU.FUSE_RES4 opts in to the fused-backbone kernel)
        res4_folded = prepare_res4_folded(
            model, params, enabled=bool(cfg.TPU.get("FUSE_RES4", False)))
        dets_per_image = {}
        t_data = t_net = t_post = t_fetch = 0.0
        # JAX dispatch is async: keep a window of in-flight device results and
        # fetch behind the dispatch frontier, so host<->device latency (a ~25 ms
        # round trip through this environment's tunnel) overlaps with device
        # compute instead of serializing per image (the reference's per-image
        # asnumpy sync, core/tester.py:139-148, has no such overlap).
        window: list[tuple] = []
        depth = int(cfg.TPU.get("EVAL_PIPELINE_DEPTH", 8))
        log_every = int(cfg.TPU.get("EVAL_LOG_EVERY", 200))

        def drain(entry):
            # the blocking np.asarray join is accounted to t_fetch, NOT t_net,
            # so the per-stage telemetry keeps the reference's data/net/post
            # meaning (core/tester.py:283-295) with an explicit D2H bucket
            nonlocal t_post, t_fetch
            image_id, dev_dets = entry
            t0 = time.time()
            dets = np.asarray(dev_dets)             # forces/joins execution
            t1 = time.time()
            t_fetch += t1 - t0
            dets_per_image[image_id] = dets[dets[:, 0] >= 0]
            t_post += time.time() - t1

        n_dev = len(mesh.devices.flat) if mesh is not None else 1
        sharded = n_dev > 1 and not proposal_file
        pending: dict[tuple, list] = {}
        sharded_fns: dict[tuple, object] = {}

        # overlap the per-bucket XLA compiles (each ~25-40 s through the
        # tunnel) instead of paying them serially as buckets first appear;
        # only worth it when the set is large enough to hit every bucket
        if (not sharded and not proposal_file and roidb is not None
                and bool(cfg.TPU.get("PREWARM_BUCKETS", True))
                and len(roidb) >= 8 * len(cfg.TPU.IMAGE_BUCKETS)
                and len(cfg.TPU.IMAGE_BUCKETS) > 1):
            prewarm_buckets(model, params, cfg, predict_fns,
                            res4_folded=res4_folded, logger=logger)

        def flush_bucket(feat_hw, items):
            """One data-parallel dispatch: n_dev images (padded by repeating
            the last) -> [n_dev, max_det, 6]; pads dropped at enqueue."""
            from relation_tpu.core.predictor import make_predict_fn_sharded
            n_real = len(items)
            while len(items) < n_dev:
                items.append(items[-1])
            if feat_hw not in sharded_fns:
                sharded_fns[feat_hw] = make_predict_fn_sharded(
                    model, cfg, feat_hw, mesh)
            imgs = np.stack([it[1] for it in items])
            infos = np.stack([np.asarray(it[2], np.float32) for it in items])
            with mesh:
                dets_b = sharded_fns[feat_hw](params, jnp.asarray(imgs),
                                              jnp.asarray(infos))
            if hasattr(dets_b, "copy_to_host_async"):
                dets_b.copy_to_host_async()
            for k in range(n_real):
                window.append((items[k][0], dets_b[k]))
            while len(window) >= depth:
                drain(window.pop(0))

        t = time.time()
        for i, item in enumerate(loader):
            image_id, img, im_info = item[:3]
            t_data += time.time() - t
            t = time.time()
            if sharded:
                from relation_tpu.data.image import image_hw
                ih, iw = image_hw(img)
                feat_hw = (ih // int(cfg.network.RCNN_FEAT_STRIDE),
                           iw // int(cfg.network.RCNN_FEAT_STRIDE))
                pending.setdefault(feat_hw, []).append(item[:3])
                if len(pending[feat_hw]) == n_dev:
                    flush_bucket(feat_hw, pending.pop(feat_hw))
                t_net += time.time() - t
                t = time.time()
                continue
            if proposal_file:
                _, _, _, rois, rois_valid = item
                out = predict_rcnn(params, jnp.asarray(img),
                                   jnp.asarray(im_info), jnp.asarray(rois),
                                   jnp.asarray(rois_valid))
            else:
                # the loader's workers already emit the device layout (s2d
                # planar when TPU.S2D_INPUT — moved off this consumer thread so
                # decode threads do the relayout in parallel)
                from relation_tpu.data.image import image_hw
                ih, iw = image_hw(img)
                feat_hw = (ih // int(cfg.network.RCNN_FEAT_STRIDE),
                           iw // int(cfg.network.RCNN_FEAT_STRIDE))
                if feat_hw not in predict_fns:
                    predict_fns[feat_hw] = _build_predict_fn(model, cfg,
                                                             feat_hw)
                out = predict_fns[feat_hw](params, jnp.asarray(img),
                                           jnp.asarray(im_info), res4_folded)
            if "monitor" in out:
                # --debug taps: fetch + log each tensor's [min, max, mean]
                # (synchronous by design — debug mode trades throughput for
                # visibility, like the reference's monitor callback)
                for name, s in out["monitor"].items():
                    s = np.asarray(s)
                    log(f"[monitor] image {image_id} {name}: min={s[0]:.5f} "
                        f"max={s[1]:.5f} mean={s[2]:.5f}")
            dev_dets = out["dets"]
            # start the D2H transfer NOW: a blocking fetch at drain time costs
            # a full host<->device round trip (~25 ms through this
            # environment's tunnel) PER IMAGE and serializes the loop to
            # ~36 img/s; with the copy in flight the drain is (amortized) free
            if hasattr(dev_dets, "copy_to_host_async"):
                dev_dets.copy_to_host_async()
            window.append((image_id, dev_dets))
            t_net += time.time() - t
            if len(window) >= depth:
                drain(window.pop(0))
            if (i + 1) % log_every == 0:
                n = i + 1
                log(f"{n}/{len(loader)} data {t_data / n:.4f}s net {t_net / n:.4f}s "
                    f"fetch {t_fetch / n:.4f}s post {t_post / n:.4f}s")
            t = time.time()
        for feat_hw, items in sorted(pending.items()):
            if items:
                flush_bucket(feat_hw, items)
        for entry in window:
            drain(entry)
        if cache_path:
            os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
            with open(cache_path, "wb") as f:
                pickle.dump(dets_per_image, f)

    if cache_path:
        # detections_<set>_results.json next to the cache, the reference's
        # results export (lib/dataset/coco.py:185-225 evaluate_detections ->
        # _write_coco_results)
        import json
        res_dir = os.path.join(os.path.dirname(cache_path) or ".", "results")
        os.makedirs(res_dir, exist_ok=True)
        image_set = getattr(cfg.dataset, "test_image_set", "test")
        res_file = os.path.join(res_dir,
                                f"detections_{image_set}_results.json")
        with open(res_file, "w") as f:
            json.dump(dataset.detections_to_json(dets_per_image), f,
                      sort_keys=True)
        log(f"wrote results json: {res_file}")

    # reference tester.py:305-307: valid class ratio (avg classes detected per
    # image) + valid score ratio (kept detections / fixed-size output slots)
    if dets_per_image:
        n_img = len(dets_per_image)
        n_cls = sum(len(np.unique(d[:, 0])) for d in dets_per_image.values()
                    if len(d))
        n_det = sum(len(d) for d in dets_per_image.values())
        max_det = int(cfg.TEST.max_per_image)
        log(f"valid class ratio:{n_cls / n_img:.4f}")
        log(f"valid score ratio:{n_det / (max_det * n_img + 0.01):.4f}")

    evaluator = CocoEvaluator(dataset)
    for image_id, dets in dets_per_image.items():
        evaluator.add_detections(image_id, dets)
    results = evaluator.summarize()
    # the reference's per-category AP table + 12-number COCOeval block
    # (lib/dataset/coco.py:262-282 + cocoeval.summarize)
    for line in format_coco_summary(
            results, getattr(dataset, "class_names", None)).splitlines():
        log(line)
    return results, dets_per_image


def pred_eval_rcnn(model, params, cfg, dataset, roidb, proposal_file: str,
                   logger=None, cache_path: str | None = None,
                   ignore_cache: bool = False):
    """Cached-proposal evaluation (reference function/test_rcnn.py driver)."""
    return pred_eval(model, params, cfg, dataset, roidb, logger,
                     cache_path=cache_path, ignore_cache=ignore_cache,
                     proposal_file=proposal_file)
