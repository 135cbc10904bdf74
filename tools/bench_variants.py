"""Per-variant end-to-end TPU latency: the reference's three model families.

Same async-tunnel methodology as bench.py (serial scan chain with a data
dependency, fetch once). Reference numbers (README.md "Main Results",
Titan X bs=1): plain 2FC+nms 0.168 s; DCN 2FC+relation+learn-nms 0.188 s;
FPN 2FC+relation+learn-nms 0.232 s; flagship 2FC+relation+learn-nms 0.175 s.

Run AFTER bench.py (each variant costs a full XLA compile, ~10 min cold).
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def measure(fn, params, image, im_info, n=100, k=3):
    import jax
    import jax.numpy as jnp

    def chained(params, image, im_info, n):
        def body(img, _):
            dets = fn(params, img, im_info)
            img = img + jnp.abs(dets[0, 1]) * 1e-30
            return img, dets[0, 1]
        img, outs = jax.lax.scan(body, image, None, length=n)
        return outs[-1]

    jfn = jax.jit(chained, static_argnums=(3,))
    _ = np.asarray(jfn(params, image, im_info, n))
    g = jax.jit(lambda a: a + 1)
    _ = np.asarray(g(jnp.zeros(())))
    rts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(g(jnp.zeros(())))
        rts.append(time.perf_counter() - t0)
    rt = min(rts)
    best = float("inf")
    for _ in range(k):
        t0 = time.perf_counter()
        _ = np.asarray(jfn(params, image, im_info, n))
        best = min(best, time.perf_counter() - t0 - rt)
    return best / n * 1e3


def measure_dispatch_chain(predict, params, image, im_info, n=100, k=3):
    """Timing for MULTI-dispatch predict fns (TPU.FPN_SPLIT_PREDICT): the
    lax.scan chain can't span two jitted programs, so chain n iterations by
    dispatching asynchronously with a device-side data dependency (a tiny
    jitted glue op feeds |dets[0,1]|*1e-30 back into the next image) and fetch
    once at the end. Dispatch is async through the tunnel, so host dispatch
    overhead overlaps device compute exactly as in production pred_eval."""
    import jax
    import jax.numpy as jnp

    glue = jax.jit(lambda img, dets: img + jnp.abs(dets[0, 1]) * 1e-30)

    def chain(img):
        out = None
        for _ in range(n):
            out = predict(params, img, im_info)
            img = glue(img, out["dets"])
        return out["dets"]

    _ = np.asarray(chain(image))          # compiles all modules
    g = jax.jit(lambda a: a + 1)
    _ = np.asarray(g(jnp.zeros(())))
    rt = min(_t(lambda: np.asarray(g(jnp.zeros(())))) for _ in range(5))
    best = float("inf")
    for _ in range(k):
        best = min(best, _t(lambda: np.asarray(chain(image))) - rt)
    return best / n * 1e3


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def build(symbol, learn_nms=True, softnms=False, **model_overrides):
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_cfg
    from relation_tpu.core.trainer import build_model
    from relation_tpu.core.predictor import make_predict_fn

    cfg = _flagship_cfg()
    cfg.symbol = symbol
    cfg.TRAIN.LEARN_NMS = learn_nms
    cfg.TEST.LEARN_NMS = learn_nms
    cfg.TEST.SOFTNMS = softnms
    if "fpn" in symbol:
        cfg.network.RPN_FEAT_STRIDE = 16      # flagship pyramid base
    model = build_model(cfg)
    if model_overrides:
        model = model.clone(**model_overrides)
    H, W = 608, 1024
    n0 = int(cfg.TEST.FIRST_N) + 1
    rois0 = jnp.tile(jnp.asarray([[0.0, 0.0, 32.0, 32.0]]), (n0, 1))
    im_info = jnp.asarray([600.0, 1000.0, 1.667], jnp.float32)
    # all trunks share ResNet101C4's stem dispatch: the s2d planar layout is
    # the production input for every family (pred_eval converts host-side)
    image = jnp.zeros((12, H // 2, W // 2), jnp.float32)
    # jitted init: eager flax init dispatches ~600 ops one by one (~5 min
    # through the async device tunnel, core/trainer.py:406-409)
    params = jax.jit(model.init, static_argnums=(4,))(
        jax.random.PRNGKey(0), image, rois0, im_info, n0)["params"]
    predict = make_predict_fn(model, cfg, (H // 16, W // 16))

    def fn(params, img, im_info):
        return predict(params, img, im_info)["dets"]
    return fn, params, image, im_info


def main():
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    variants = [
        # (label, symbol, learn_nms, softnms, reference seconds)
        ("plain_2fc_nms", "resnet_v1_101_rcnn", False, False, 0.168),
        ("plain_2fc_softnms", "resnet_v1_101_rcnn", False, True, 0.200),
        ("relation_softnms",
         "resnet_v1_101_rcnn_attention_1024_pairwise_position_multi_head_16",
         False, True, 0.211),
        ("dcn_relation_learn_nms",
         "resnet_v1_101_rcnn_dcn_attention_1024_pairwise_position_multi_head_16_learn_nms",
         True, False, 0.188),
        ("fpn_relation_learn_nms",
         "resnet_v1_101_rcnn_fpn_attention_1024_pairwise_position_multi_head_16_learn_nms",
         True, False, 0.232),
        # realistic class activation (round-2 verdict #5): trained-COCO images
        # keep 5-20 classes above the 0.01 class filter; biasing cls_score so
        # ~16 fg classes stay active makes the learned-NMS lax.cond take the
        # XLA class-gather compact path IN CONTEXT (the random-params variants
        # above activate all 80 classes = dense worst case by construction)
        ("fpn_relation_learn_nms_active16",
         "resnet_v1_101_rcnn_fpn_attention_1024_pairwise_position_multi_head_16_learn_nms",
         True, False, 0.232),
        # same realistic activation for the C4 flagship: the lax.cond takes
        # the fused Pallas skip kernel (~14 us/class) instead of the dense
        # geom_bias+einsum mix — bench.py stays the dense worst case
        ("flagship_learn_nms_active16",
         "resnet_v1_101_rcnn_attention_1024_pairwise_position_multi_head_16_learn_nms",
         True, False, 0.175),
    ]
    variants += [
        # two-dispatch FPN predict (TPU.FPN_SPLIT_PREDICT): XLA-only module 1,
        # Pallas learned-NMS tail in its own module 2 (the round-3 verdict's
        # proposed escape from the 2.27 ms XLA-dense tail floor). Measured
        # with the dispatch-chain harness (two programs can't share a scan).
        ("fpn_split_learn_nms",
         "resnet_v1_101_rcnn_fpn_attention_1024_pairwise_position_multi_head_16_learn_nms",
         True, False, 0.232),
        ("fpn_split_learn_nms_active16",
         "resnet_v1_101_rcnn_fpn_attention_1024_pairwise_position_multi_head_16_learn_nms",
         True, False, 0.232),
        # three-dispatch FPN predict (TPU.FPN_SPLIT_PREDICT=3): XLA-only conv
        # module | Pallas proposal-NMS sweep module | Pallas head+tail module
        ("fpn_split3_learn_nms",
         "resnet_v1_101_rcnn_fpn_attention_1024_pairwise_position_multi_head_16_learn_nms",
         True, False, 0.232),
        ("fpn_split3_learn_nms_active16",
         "resnet_v1_101_rcnn_fpn_attention_1024_pairwise_position_multi_head_16_learn_nms",
         True, False, 0.232),
    ]
    want = [a for a in sys.argv[1:] if not a.startswith("-")]
    for label, symbol, ln, sn, ref_s in variants:
        if want and not any(w in label for w in want):
            continue
        try:
            if label.startswith("fpn_split"):
                import jax
                from __graft_entry__ import _flagship_cfg
                from relation_tpu.core.trainer import build_model
                from relation_tpu.core.predictor import (
                    make_predict_fn_split, make_predict_fn_split3)
                cfg = _flagship_cfg()
                cfg.symbol = symbol
                cfg.TRAIN.LEARN_NMS = cfg.TEST.LEARN_NMS = True
                cfg.network.RPN_FEAT_STRIDE = 16
                model = build_model(cfg)
                H, W = 608, 1024
                n0 = int(cfg.TEST.FIRST_N) + 1
                rois0 = jnp.tile(jnp.asarray([[0.0, 0.0, 32.0, 32.0]]), (n0, 1))
                im_info = jnp.asarray([600.0, 1000.0, 1.667], jnp.float32)
                image = jnp.zeros((12, H // 2, W // 2), jnp.float32)
                params = jax.jit(model.init, static_argnums=(4,))(
                    jax.random.PRNGKey(0), image, rois0, im_info,
                    n0)["params"]
                if label.endswith("_active16"):
                    b = np.zeros(81, np.float32)
                    b[1:] = -9.0
                    b[rng.choice(80, 16, replace=False) + 1] = 0.0
                    params = dict(params)
                    params["cls_score"] = dict(params["cls_score"],
                                               bias=jnp.asarray(b))
                mk = (make_predict_fn_split3 if label.startswith("fpn_split3")
                      else make_predict_fn_split)
                predict = mk(model, cfg, (H // 16, W // 16))
                img = jnp.asarray(rng.randn(*image.shape).astype(np.float32) * 40)
                ms = measure_dispatch_chain(predict, params, img, im_info)
                print(json.dumps({"variant": label, "value": round(ms, 3),
                                  "unit": "ms/image",
                                  "vs_baseline": round(ref_s * 1e3 / ms, 1)}),
                      flush=True)
                continue
            fn, params, image, im_info = build(symbol, ln, softnms=sn)
            if label.endswith("_active16"):
                b = np.zeros(81, np.float32)
                b[1:] = -9.0                      # ~e^-9 softmax mass: inactive
                b[rng.choice(80, 16, replace=False) + 1] = 0.0
                params = dict(params)
                params["cls_score"] = dict(params["cls_score"],
                                           bias=jnp.asarray(b))
            img = jnp.asarray(rng.randn(*image.shape).astype(np.float32) * 40)
            ms = measure(fn, params, img, im_info)
            print(json.dumps({"variant": label, "value": round(ms, 3),
                              "unit": "ms/image",
                              "vs_baseline": round(ref_s * 1e3 / ms, 1)}),
                  flush=True)
        except Exception as e:  # keep going: each variant is independent
            print(json.dumps({"variant": label,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
