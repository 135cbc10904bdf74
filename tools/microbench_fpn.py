"""Bisect the FPN e2e latency by CUMULATIVE graph cuts.

Round-1 finding (CLAUDE.md): FPN e2e measured 14.8 ms but isolated traced-arg
stage probes summed to ~6.5 ms. Isolated probes lose in-context effects (layout
choices, fusion decisions, s2b rewrites that depend on downstream consumers).
This tool instead times nested prefixes of the ONE real graph:

  c4c5 < neck < rpn < props < head < full

so diff(cut_i, cut_{i-1}) is the marginal in-context cost of each stage, and the
last row reproduces the bench_variants number. Same async-tunnel methodology as
tools/microbench.py (scan chain, data-dependent roll feedback, fetch once).

Usage: python tools/microbench_fpn.py [cut ...] [--pallas] [--nms-kernel]
  (default: all cuts; --pallas builds the model with allow_pallas=True,
   --nms-kernel uses the Pallas presorted NMS sweep for FPN proposals —
   both for measuring the s2b-poison penalty in context)
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit_pytree_us(fn, x, *rest, n=30, k=3):
    """Like tools.microbench.timeit_us but fn may return any pytree."""
    import jax
    import jax.numpy as jnp

    def feedback(y, x):
        leaves = jax.tree_util.tree_leaves(y)
        t = sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves)
        t = jnp.where(jnp.isfinite(t), t, 1.0)
        shift = (jnp.mod(t, 61.0)).astype(jnp.int32) + 1
        return jnp.roll(x.reshape(-1), shift).reshape(x.shape)

    def chained(x, *rest):
        def body(x, _):
            y = fn(x, *rest)
            return feedback(y, x), ()
        xf, _ = jax.lax.scan(body, x, None, length=n)
        leaves = jax.tree_util.tree_leaves(fn(xf, *rest))
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves)

    jfn = jax.jit(chained)
    _ = np.asarray(jfn(x, *rest))
    g = jax.jit(lambda a: a + 1)
    _ = np.asarray(g(jnp.zeros(())))
    rts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(g(jnp.zeros(())))
        rts.append((time.perf_counter() - t0) * 1e3)
    rt = min(rts)
    best = float("inf")
    for _ in range(k):
        t0 = time.perf_counter()
        _ = np.asarray(jfn(x, *rest))
        best = min(best, (time.perf_counter() - t0) * 1e3)
    return max(best - rt, 0.0) / n * 1e3


def main():
    import functools
    import jax
    import jax.numpy as jnp

    argv = sys.argv[1:]
    use_pallas = "--pallas" in argv
    nms_kernel = "--nms-kernel" in argv
    argv = [a for a in argv if not a.startswith("--")]

    import relation_tpu.models.fpn as fpn_mod
    if nms_kernel:
        # make the production predictor (built inside build()) pick the
        # Pallas sweep; must happen before make_predict_fn imports the name
        orig_gp = fpn_mod.generate_proposals_fpn

        @functools.wraps(orig_gp)
        def gp_kernel(*a, **k):
            k["use_kernel"] = True
            return orig_gp(*a, **k)
        fpn_mod.generate_proposals_fpn = gp_kernel

    from tools.bench_variants import build
    from relation_tpu.models.fpn import (RelationRCNNFPN, fpn_anchors,
                                         generate_proposals_fpn, FPN_STRIDES,
                                         DISPATCH_STRIDES)
    from __graft_entry__ import _flagship_cfg

    overrides = {"allow_pallas": True} if use_pallas else {}
    cfg = _flagship_cfg()
    symbol = ("resnet_v1_101_rcnn_fpn_attention_1024_pairwise_position_"
              "multi_head_16_learn_nms")
    fn, params, image, im_info = build(symbol, True, **overrides)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(*image.shape).astype(np.float32) * 40)

    from relation_tpu.core.trainer import build_model
    cfg.symbol = symbol
    cfg.TRAIN.LEARN_NMS = True
    cfg.TEST.LEARN_NMS = True
    cfg.network.RPN_FEAT_STRIDE = 16
    model = build_model(cfg)
    if overrides:
        model = model.clone(**overrides)
    nongt_dim = int(cfg.TEST.RPN_POST_NMS_TOP_N)

    def cut_c4c5(p, x, info):
        def run(m, x):
            f = m.c4(x[None])
            f[5] = m.c5(f[4])
            return f
        return model.apply({"params": p}, x, method=run)

    def cut_neck(p, x, info):
        def run(m, x):
            f = m.c4(x[None])
            f[5] = m.c5(f[4])
            return m.neck(f)
        return model.apply({"params": p}, x, method=run)

    def cut_rpn(p, x, info):
        return model.apply({"params": p}, x,
                           method=RelationRCNNFPN.features_and_rpn)

    def _props(p, x, info):
        feat, rpn_out = model.apply({"params": p}, x,
                                    method=RelationRCNNFPN.features_and_rpn)
        level_anchors = fpn_anchors(
            {s: rpn_out[s][0].shape[:2] for s in FPN_STRIDES},
            tuple(cfg.network.ANCHOR_SCALES), tuple(cfg.network.ANCHOR_RATIOS))
        rois, scores, real = generate_proposals_fpn(
            rpn_out, level_anchors, info,
            int(cfg.TEST.RPN_PRE_NMS_TOP_N), int(cfg.TEST.RPN_POST_NMS_TOP_N),
            float(cfg.TEST.RPN_NMS_THRESH), float(cfg.TEST.RPN_MIN_SIZE),
            topk=str(cfg.TPU.get("FPN_TOPK", "exact")))
        return feat, rois, scores

    def cut_topk(p, x, info):
        """Everything in _props up to (but excluding) the NMS sweep: re-runs
        the per-level decode + masked top_k, returning the planar top boxes."""
        feat, rpn_out2 = model.apply({"params": p}, x,
                                     method=RelationRCNNFPN.features_and_rpn)
        level_anchors = fpn_anchors(
            {s: rpn_out2[s][0].shape[:2] for s in FPN_STRIDES},
            tuple(cfg.network.ANCHOR_SCALES), tuple(cfg.network.ANCHOR_RATIOS))
        sc, pxy = [], []
        for stride, (cls, bbox) in rpn_out2.items():
            H, W = cls.shape[0], cls.shape[1]
            A = cls.shape[2] // 2
            tc = cls.transpose(2, 0, 1).astype(jnp.float32)
            fg = jax.nn.sigmoid((tc[1::2] - tc[0::2]).reshape(-1))
            td = bbox.transpose(2, 0, 1).astype(jnp.float32)
            sc.append(fg)
            pxy.append(td[0::4].reshape(-1))
        scores = jnp.concatenate(sc)
        k = int(cfg.TEST.RPN_PRE_NMS_TOP_N)
        top_scores, top_idx = jax.lax.top_k(scores, k)
        return top_scores, jnp.concatenate(pxy)[top_idx]

    def cut_props(p, x, info):
        feat, rois, scores = _props(p, x, info)
        return rois, scores    # feat feeds nothing: its convs may dce/shrink

    def cut_props_live(p, x, info):
        feat, rois, scores = _props(p, x, info)
        return ({s: jnp.sum(jnp.abs(f)) for s, f in feat.items()}, rois, scores)

    def cut_pool(p, x, info):
        """props + the head's 4-level pooling/select only (no FCs/relation)."""
        from relation_tpu.ops.roi_pool import roi_align_mxu, roi_pool
        feat, rois, scores = _props(p, x, info)
        fid = fpn_mod.roi_level_dispatch(rois)
        pooled = []
        for s in DISPATCH_STRIDES:
            if model.roi_method == "align":
                pooled.append(roi_align_mxu(feat[s], rois, 1.0 / s, 7))
            else:
                pooled.append(roi_pool(feat[s], rois, 1.0 / s, 7))
        stacked = jnp.stack(pooled, axis=0)
        sel = jnp.take_along_axis(
            stacked, fid[None, :, None, None, None], axis=0)[0]
        return sel, scores

    def cut_head(p, x, info):
        feat, rois, scores = _props(p, x, info)
        cls_s, bbox_p, fc2 = model.apply({"params": p}, feat, rois, nongt_dim,
                                         method=RelationRCNNFPN.head)
        return cls_s, bbox_p, fc2

    def cut_full(p, x, info):
        return fn(p, x, info)

    cuts = [("c4c5", cut_c4c5), ("neck", cut_neck), ("rpn", cut_rpn),
            ("topk", cut_topk), ("props", cut_props_live), ("pool", cut_pool),
            ("head", cut_head), ("full", cut_full)]
    want = argv or [c[0] for c in cuts]
    prev = 0.0
    for name, f in cuts:
        if name not in want:
            continue
        t0 = time.perf_counter()
        us = timeit_pytree_us(lambda x, p, info, f=f: f(p, x, info),
                              img, params, im_info)
        print("%-6s %9.1f us  (delta %+8.1f)  [compile+run %.0fs]"
              % (name, us, us - prev, time.perf_counter() - t0), flush=True)
        prev = us


if __name__ == "__main__":
    main()
