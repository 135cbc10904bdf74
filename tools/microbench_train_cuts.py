"""Cumulative-cut profile of the TRAIN step vs batch size, on the real chip.

Round-2 verdict: per-image train cost RISES with batch (B=1 25.8 ms, B=4
32.9 ms/img) — this tool localizes which stage sub-scales, using the same
cumulative-cut methodology that found the FPN inference budget
(tools/microbench_fpn.py): each cut compiles the REAL train step truncated
after a named stage (core/trainer.py make_train_step(stop_after=...)), so
every measurement is the one production graph, never an isolated probe.

--mode bwd: BACKWARD cumulative cuts. Every leg is the FULL train step; legs
differ only in the grad_req='null' stop-gradient set (make_train_step
fixed_prefixes), freezing the net bottom-up so each delta is one stage's
whole backward (wgrad + every dgrad chain that exists only to feed it —
XLA DCEs dead chains because frozen params are stop_gradient'd, trainer.py):
  full       : production freeze (conv1+res2)
  f_res3     : + res3        (delta = res3 backward)
  f_res4     : + res4        (delta = res4 backward)
  f_res5     : + res5        (delta = res5 backward)
  f_rpn      : + rpn         (delta = rpn-head backward)
  f_head     : + conv_new/fc_new/relation/cls/bbox (delta = roi-head backward)
  f_all      : + nms_/learn-nms params (delta = learned-NMS backward)
  fwd_only   : no value_and_grad at all (delta vs f_all = autodiff overhead
               that survives full freezing + optimizer no-op update)

Usage: python tools/microbench_train_cuts.py [--batch 1 4] [--cuts rpn ...]
       python tools/microbench_train_cuts.py --mode bwd [--batch 1 4]
"""
import argparse
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

CUTS = ["rpn", "anchor_targets", "proposals", "sample", "feat", "pool",
        "head", "lnms_embed", "lnms_attn", "lnms_score", "lnms_target", ""]


# FPN cached-proposal RCNN step (make_train_step_rcnn): no RPN loss; the
# neck ("fpn_" laterals/smooth convs) and the FC head replace the C4/C5 legs
FPN_BWD_LEGS = [
    ("full", ()),
    ("f_res3", ("res3", "bn3")),
    ("f_res4", ("res3", "bn3", "res4", "bn4")),
    ("f_res5", ("res3", "bn3", "res4", "bn4", "res5", "bn5")),
    ("f_neck", ("res3", "bn3", "res4", "bn4", "res5", "bn5", "fpn_")),
    ("f_head", ("res3", "bn3", "res4", "bn4", "res5", "bn5", "fpn_",
                "roi_pool_fc", "cls_score", "bbox_pred", "relation")),
    ("f_all", ("",)),
    ("fwd_only", None),
]

BWD_LEGS = [
    ("full", ()),
    ("f_res3", ("res3", "bn3")),
    ("f_res4", ("res3", "bn3", "res4", "bn4")),
    ("f_res5", ("res3", "bn3", "res4", "bn4", "res5", "bn5")),
    ("f_rpn", ("res3", "bn3", "res4", "bn4", "res5", "bn5", "rpn")),
    ("f_head", ("res3", "bn3", "res4", "bn4", "res5", "bn5", "rpn",
                "conv_new_1", "fc_new", "cls_score", "bbox_pred", "relation",
                "offset")),
    ("f_all", ("",)),          # '' prefix-matches every param
    ("fwd_only", None),        # no value_and_grad at all
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[1, 4])
    ap.add_argument("--cuts", nargs="+", default=CUTS)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--mode", choices=["fwd", "bwd"], default="fwd",
                    help="fwd: stop_after stage cuts; bwd: grad_req-null "
                         "freeze cuts (see module docstring)")
    ap.add_argument("--no-grad", action="store_true",
                    help="fwd mode: compile every stop_after cut WITHOUT "
                         "value_and_grad — cumulative FORWARD-stage profile "
                         "(where does the train forward exceed inference?)")
    ap.add_argument("--legs", nargs="+", default=None,
                    help="bwd mode: subset of leg names to run")
    ap.add_argument("--set", dest="overrides", nargs="+", default=[],
                    metavar="SECTION.KEY=VAL",
                    help="cfg overrides, e.g. TPU.LNMS_REMAT=1 (int/float/"
                         "bool literals parsed; applied after _flagship_cfg)")
    ap.add_argument("--family", choices=["flagship", "dcn", "fpn"],
                    default="flagship",
                    help="dcn: DCN+relation+learn-NMS end2end step; fpn: the "
                         "reference FPN training mode (RCNN stage on cached "
                         "proposals, make_train_step_rcnn with max_rois=1000 "
                         "per cfgs/..._fpn_*.yaml TOP_ROIS) — full step only, "
                         "no freeze legs")
    args = ap.parse_args()
    # compile cache OPT-IN (warm cache measured slower than cold through the
    # axon tunnel, BASELINE.md round 3); steady-state timings are unaffected
    # either way, so set RELATION_TPU_COMPILE_CACHE only to trade honesty of
    # the cold-start for a faster multi-cut sweep
    from relation_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache(os.environ.get("RELATION_TPU_COMPILE_CACHE", ""))
    from __graft_entry__ import _flagship_cfg
    from relation_tpu.core.trainer import (build_model, make_train_step,
                                           create_train_state)

    cfg = _flagship_cfg()
    cfg.TRAIN.lr = 1e-5
    cfg.TRAIN.warmup = False
    cfg.TPU.GRAD_CLIP = 1.0
    if args.family == "dcn":
        cfg.symbol = ("resnet_v1_101_rcnn_dcn_attention_1024_pairwise_"
                      "position_multi_head_16_learn_nms")
    elif args.family == "fpn":
        # reference FPN training values (cfgs/..._fpn_relation_learn_nms)
        cfg.symbol = ("resnet_v1_101_rcnn_fpn_attention_1024_pairwise_"
                      "position_multi_head_16_learn_nms")
        cfg.network.ANCHOR_SCALES = (8,)
        cfg.network.NUM_ANCHORS = 3
        cfg.TRAIN.BATCH_ROIS_OHEM = 512
        cfg.TRAIN.FIRST_N = 150
        cfg.TEST.FIRST_N = 150
    for ov in args.overrides:
        path, _, raw = ov.partition("=")
        try:
            val = eval(raw, {}, {})       # 1 / 0.5 / True / "approx"
        except Exception:
            val = raw
        node = cfg
        *heads, leaf = path.split(".")
        for h in heads:
            node = node[h]
        node[leaf] = val
        print(f"cfg override: {path} = {val!r}")
    model = build_model(cfg)
    H, W = 608, 1024
    rng = np.random.RandomState(0)

    # tunnel liveness probe FIRST (a dead/wedged tunnel hangs silently on the
    # first dispatch; surface it before the expensive init compile)
    print("probe: scalar roundtrip...", flush=True)
    g = jax.jit(lambda a: a + 1)
    np.asarray(g(jnp.zeros(())))
    rt = min(_t(lambda: np.asarray(g(jnp.zeros(())))) for _ in range(5))
    print(f"probe ok (rt {rt * 1e3:.1f} ms); init...", flush=True)

    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               jnp.zeros((12, H // 2, W // 2)),
                               jnp.asarray([float(H), float(W), 1.0]))
    host_state = jax.tree.map(np.asarray, state)
    max_gt = int(cfg.TPU.get("MAX_GT", 100))
    print("init done", flush=True)

    results = {}
    for B in args.batch:
        gt = np.zeros((B, max_gt, 5), np.float32)
        gv = np.zeros((B, max_gt), bool)
        for b in range(B):
            gt[b, 0] = [30, 40, 260, 300, 17]
            gt[b, 1] = [300, 200, 580, 420, 3]
            gt[b, 2] = [100, 350, 220, 500, 56]
            gv[b, :3] = True
        batch = {
            "image": jnp.asarray(rng.randn(B, 12, H // 2, W // 2)
                                 .astype(np.float32) * 40),
            "im_info": jnp.tile(jnp.asarray([[600.0, 1000.0, 1.667]],
                                            jnp.float32), (B, 1)),
            "gt_boxes": jnp.asarray(gt),
            "gt_valid": jnp.asarray(gv),
        }
        if args.family == "fpn":
            # the reference FPN training step: head(+learn-NMS) on cached
            # proposals, frozen-through-res2 trunk forward in the graph
            # (function/train_rcnn.py semantics; core/rpn_workflow.py)
            from relation_tpu.core.rpn_workflow import make_train_step_rcnn
            R = 1000                       # TRAIN.TOP_ROIS, reference FPN yaml
            rois_np = np.zeros((B, R, 4), np.float32)
            for b in range(B):
                xy = rng.rand(R, 2) * [900, 500]
                wh = 20 + rng.rand(R, 2) * [400, 300]
                rois_np[b, :, :2] = xy
                rois_np[b, :, 2:] = np.minimum(xy + wh, [999, 599])
            batch["rois"] = jnp.asarray(rois_np)
            batch["rois_valid"] = jnp.ones((B, R), bool)
            if args.mode == "bwd":
                legs = [l for l in FPN_BWD_LEGS
                        if args.legs is None or l[0] in args.legs]
            else:
                # fwd mode: cumulative stop_after cuts of the cached-proposal
                # step (combine with --no-grad for the forward-only profile)
                fpn_cuts = [c for c in ("trunk", "sample", "pool", "head", "")
                            if args.cuts is CUTS or c in args.cuts]
                legs = [(("ng_" if args.no_grad else "cut_") + (c or "full"),
                         ("stop", c)) for c in fpn_cuts]
            base = tuple(cfg.network.FIXED_PARAMS)
            prev = 0.0
            for name, extra in legs:
                if extra is None:
                    step = make_train_step_rcnn(model, cfg, max_rois=R,
                                                max_gt=max_gt, no_grad=True)
                elif len(extra) == 2 and extra[0] == "stop":
                    step = make_train_step_rcnn(model, cfg, max_rois=R,
                                                max_gt=max_gt,
                                                stop_after=extra[1],
                                                no_grad=args.no_grad)
                else:
                    step = make_train_step_rcnn(model, cfg, max_rois=R,
                                                max_gt=max_gt,
                                                fixed_prefixes=base + extra)
                jstep = jax.jit(step, donate_argnums=(0,))
                print(f"B={B} fpn_rcnn_{name}: compiling...", flush=True)
                cur, m = jstep(jax.device_put(host_state), batch)
                np.asarray(m["total_loss"])
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    for _ in range(args.steps):
                        cur, m = jstep(cur, batch)
                    float(np.asarray(m["total_loss"]))
                    best = min(best,
                               (time.perf_counter() - t0 - rt)
                               / args.steps * 1e3)
                results[(B, f"fpn_rcnn_{name}")] = best
                print(f"B={B} fpn_rcnn_{name:<10} {best:8.2f} ms total "
                      f"{best / B:7.2f} ms/img"
                      + (f"  (-{(prev - best) / B:6.2f} ms/img vs prev)"
                         if prev else ""), flush=True)
                prev = best
                del cur, m, jstep
            continue
        prev = 0.0
        if args.mode == "bwd":
            legs = [l for l in BWD_LEGS
                    if args.legs is None or l[0] in args.legs]
            base = tuple(cfg.network.FIXED_PARAMS)
            for name, extra in legs:
                if extra is None:
                    step = make_train_step(model, cfg, no_grad=True)
                else:
                    step = make_train_step(model, cfg,
                                           fixed_prefixes=base + extra)
                jstep = jax.jit(step, donate_argnums=(0,))
                print(f"B={B} leg={name}: compiling...", flush=True)
                cur, m = jstep(jax.device_put(host_state), batch)
                np.asarray(m["total_loss"])
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    for _ in range(args.steps):
                        cur, m = jstep(cur, batch)
                    float(np.asarray(m["total_loss"]))
                    best = min(best,
                               (time.perf_counter() - t0 - rt) / args.steps * 1e3)
                results[(B, name)] = best
                print(f"B={B} leg={name:<10} {best:8.2f} ms total "
                      f"{best / B:7.2f} ms/img  (-{(prev - best) / B:6.2f}"
                      f" ms/img vs prev)" if prev else
                      f"B={B} leg={name:<10} {best:8.2f} ms total "
                      f"{best / B:7.2f} ms/img", flush=True)
                prev = best
                del cur, m, jstep
            continue
        for cut in args.cuts:
            step = make_train_step(model, cfg, stop_after=cut,
                                   no_grad=args.no_grad)
            jstep = jax.jit(step, donate_argnums=(0,))
            print(f"B={B} cut={cut or 'full'}: compiling...", flush=True)
            cur, m = jstep(jax.device_put(host_state), batch)
            np.asarray(m["total_loss"])
            n = args.steps
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(n):
                    cur, m = jstep(cur, batch)
                float(np.asarray(m["total_loss"]))
                best = min(best, (time.perf_counter() - t0 - rt) / n * 1e3)
            name = ("ng_" if args.no_grad else "") + (cut or "full")
            results[(B, name)] = best
            print(f"B={B} cut={name:<14} {best:8.2f} ms total "
                  f"{best / B:7.2f} ms/img  (+{(best - prev) / B:6.2f} ms/img)",
                  flush=True)
            prev = best
            del cur, m, jstep

    if (args.mode == "fwd" and args.family != "fpn"
            and len(args.batch) >= 2 and len(args.cuts) >= 2):
        b0, b1 = args.batch[0], args.batch[-1]
        print(f"\nper-image stage deltas (B={b0} vs B={b1}):")
        prev0 = prev1 = 0.0
        for cut in args.cuts:
            name = ("ng_" if args.no_grad else "") + (cut or "full")
            d0 = (results[(b0, name)] - prev0) / b0
            d1 = (results[(b1, name)] - prev1) / b1
            flag = "  <-- sub-scales" if d1 > 1.15 * d0 else ""
            print(f"  {name:<14} B={b0}: {d0:6.2f}  B={b1}: {d1:6.2f} ms/img{flag}")
            prev0, prev1 = results[(b0, name)], results[(b1, name)]


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
