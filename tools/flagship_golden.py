"""Flagship-shape TPU golden: a production-size regression pin for kernel drift.

The CPU goldens (tests/test_golden_e2e.py) pin tiny graphs on the CPU backend;
they cannot see a regression in the Pallas kernels (stem, geometry bias, NMS
sweep, class-skip attention) or in XLA-on-TPU numerics, because none of those
run at tiny CPU shapes. This tool pins the FULL flagship predict (ResNet-101 +
relation head + learned NMS, 608x1024, random bf16 params — the same graph
bench.py times) on the real chip:

  python tools/flagship_golden.py --generate   # writes tests/golden/flagship_tpu.npz
  python tools/flagship_golden.py --check      # re-runs, compares in a band

Tolerance design: bf16 + XLA version drift move individual logits by ~1e-2
relative, and a near-tie can swap two detections' ranks, so an exact pin is
brittle. The check matches each golden top-K detection to the best-IoU new
detection of the same class and asserts IoU >= 0.95 and |score delta| <= 2e-2,
plus band checks on global summaries. A real kernel bug (wrong slice, broken
accumulation, a clamp flipping wholesale) moves boxes or scores far beyond
these bands; reruns on the same stack pass bit-identically (XLA is
deterministic per compile).

Reference counterpart: none (the reference has no numeric regression pins at
all — its tests are mAP runs); this is SURVEY §4's "golden fixture" strategy
applied at production shape.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                      "flagship_tpu.npz")
TOP_K = 50          # detections pinned by box/class/score
IOU_MIN = 0.95      # golden box vs best same-class new box
SCORE_ATOL = 2e-2   # per-detection score band
MEAN_RTOL = 5e-3    # summary-score band


def _dets():
    """Run the flagship predict once on the default device; [N, 6] dets
    (cls, score, x1, y1, x2, y2) sorted by score desc.

    Same graph as __graft_entry__.entry() (flagship cfg, PRNGKey(0) params)
    but driven with a SEEDED random image — a zero image leaves most of the
    network in its degenerate linear regime and would pin far fewer code
    paths (ReLU gates, NMS ties, the class-skip lax.cond)."""
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_cfg
    from relation_tpu.core.trainer import build_model
    from relation_tpu.core.predictor import make_predict_fn

    cfg = _flagship_cfg()
    model = build_model(cfg)
    H, W = 608, 1024
    rois0 = jnp.tile(jnp.asarray([[0.0, 0.0, 32.0, 32.0]]),
                     (int(cfg.TEST.FIRST_N) + 1, 1))
    im_info = jnp.asarray([600.0, 1000.0, 1.667], jnp.float32)
    params = jax.jit(model.init, static_argnums=(4,))(
        jax.random.PRNGKey(0), jnp.zeros((12, H // 2, W // 2)), rois0,
        im_info, int(cfg.TEST.FIRST_N) + 1)["params"]
    image = jnp.asarray(
        np.random.RandomState(7).randn(12, H // 2, W // 2).astype(np.float32)
        * 40.0)
    predict = make_predict_fn(model, cfg, (H // 16, W // 16))
    out = np.asarray(predict(params, image, im_info)["dets"])
    dets = out[out[:, 0] >= 0]
    order = np.argsort(-dets[:, 1], kind="stable")
    return dets[order].astype(np.float32)


def _iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """IoU of one box a [4] vs boxes b [M, 4] (+1 width convention)."""
    ix = np.maximum(0, np.minimum(a[2], b[:, 2]) - np.maximum(a[0], b[:, 0]) + 1)
    iy = np.maximum(0, np.minimum(a[3], b[:, 3]) - np.maximum(a[1], b[:, 1]) + 1)
    inter = ix * iy
    ua = ((a[2] - a[0] + 1) * (a[3] - a[1] + 1)
          + (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1) - inter)
    return inter / np.maximum(ua, 1e-9)


def generate():
    dets = _dets()
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.savez(GOLDEN, dets=dets,
             n_dets=np.int32(len(dets)),
             mean_top50=np.float32(dets[:TOP_K, 1].mean()))
    print(f"wrote {os.path.relpath(GOLDEN)}: {len(dets)} dets, "
          f"mean top-{TOP_K} score {dets[:TOP_K, 1].mean():.5f}")


def check():
    ref = np.load(GOLDEN)
    gold, new = ref["dets"], _dets()
    errs = []
    # summary bands
    if abs(len(new) - int(ref["n_dets"])) > max(2, int(0.05 * int(ref["n_dets"]))):
        errs.append(f"det count {len(new)} vs golden {int(ref['n_dets'])}")
    m_new, m_gold = new[:TOP_K, 1].mean(), float(ref["mean_top50"])
    if abs(m_new - m_gold) > MEAN_RTOL * max(abs(m_gold), 1e-3):
        errs.append(f"mean top-{TOP_K} score {m_new:.5f} vs {m_gold:.5f}")
    # per-detection matching, golden top-K -> best same-class IoU in new
    for i, g in enumerate(gold[:TOP_K]):
        same = new[new[:, 0] == g[0]]
        if not len(same):
            errs.append(f"top-{i}: class {int(g[0])} vanished")
            continue
        ious = _iou(g[2:6], same[:, 2:6])
        j = int(np.argmax(ious))
        if ious[j] < IOU_MIN:
            errs.append(f"top-{i} cls {int(g[0])}: best IoU {ious[j]:.3f}")
        elif abs(same[j, 1] - g[1]) > SCORE_ATOL:
            errs.append(f"top-{i} cls {int(g[0])}: score {same[j, 1]:.4f} "
                        f"vs {g[1]:.4f}")
    if errs:
        print("FLAGSHIP GOLDEN MISMATCH:")
        for e in errs[:20]:
            print(" ", e)
        sys.exit(1)
    print(f"flagship TPU golden OK: {len(new)} dets, top-{TOP_K} matched "
          f"(IoU>={IOU_MIN}, |ds|<={SCORE_ATOL}), mean {m_new:.5f}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--generate", action="store_true")
    g.add_argument("--check", action="store_true")
    a = p.parse_args()
    generate() if a.generate else check()
