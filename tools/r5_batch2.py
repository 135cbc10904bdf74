"""Round-5 TPU measurement batch 2 — ONE process (see r5_batch1.py).

Sequence:
  1. DCN bwd legs with the NATIVELY-BATCHED deformable conv (flat row
     gathers/scatters; replaces vmap-of-per-image whose batched
     gather/scatter lowering measured res5-bwd 17.5-18.5 ms/img) — B=1,4.
  2. Same legs with RELATION_TPU_DEFORM_VJP=autodiff (in-process monkeypatch
     + clear_caches) — decides the default VJP mode on real numbers.
  3. DCN forward-only cuts incl. the new 'feat' cut (splits the deformable
     res5 forward from the deformable-PSROI pooling) — B=4.
  4. Flagship forward-only learned-NMS sub-cuts (head | lnms_score |
     lnms_target | full) — B=8: splits attention fwd vs target matching
     vs losses inside the 2.07 ms/img branch.
  5. FPN forward-only cuts (trunk | sample | pool | head | full) — B=4
     (queued in batch 1 but after the slow DCN legs; re-run here in case
     batch 1 was cut short) + FPN bwd 'full' leg A/B of the one-hot level
     select fix (models/fpn.py) vs round-4's take_along_axis baseline
     34.96 ms/img.
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def run(argv, vjp_mode=None):
    import jax
    import microbench_train_cuts
    if vjp_mode is not None:
        from relation_tpu.ops import deform
        deform._DCONV_VJP_MODE = vjp_mode
        print(f"[deform VJP mode = {vjp_mode}]", flush=True)
    print(f"\n===== {' '.join(argv)}"
          + (f" [vjp={vjp_mode}]" if vjp_mode else "") + " =====", flush=True)
    t0 = time.time()
    sys.argv = ["microbench_train_cuts.py"] + argv
    microbench_train_cuts.main()
    print(f"===== done in {time.time() - t0:.0f}s =====", flush=True)
    jax.clear_caches()


def nms_kernel_device_parity():
    """Focused device parity of the presorted Pallas NMS sweep vs the XLA
    while-loop fixpoint on a REALISTIC score pattern (batch-1's split3 probe
    compared full random-param dets, where thousands of near-equal random
    scores make the keep set chaotically tie-sensitive — that comparison
    can't distinguish a kernel bug from tie noise). Here: decaying distinct
    scores, clustered overlapping boxes, FPN pre/post-NMS sizes."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from relation_tpu.ops.nms import nms_topk_presorted

    print("\n===== presorted-NMS kernel device parity =====", flush=True)
    t0 = time.time()
    rng = np.random.RandomState(0)
    N, keep_n = 6000, 1000
    # clustered boxes: many high-overlap groups (the hard case for sweep order)
    centers = rng.rand(N // 4, 2) * [1000, 600]
    base = np.repeat(centers, 4, axis=0)[:N]
    wh = 20 + rng.rand(N, 2) * 200
    jitter = rng.randn(N, 2) * 8
    x1y1 = np.clip(base + jitter - wh / 2, 0, None)
    x2y2 = np.minimum(x1y1 + wh, [999, 599])
    boxes = np.concatenate([x1y1, x2y2], 1).astype(np.float32)
    scores = np.sort(rng.rand(N).astype(np.float32))[::-1].copy()
    scores += np.arange(N, 0, -1, dtype=np.float32) * 1e-5   # strictly distinct
    order = np.argsort(-scores, kind="stable")
    bT = jnp.asarray(boxes[order].T)
    sc = jnp.asarray(scores[order])
    valid = jnp.ones(N, bool)

    f_k = jax.jit(lambda b, s, v: nms_topk_presorted(
        b, s, v, 0.7, keep_n, use_kernel=True))
    f_w = jax.jit(lambda b, s, v: nms_topk_presorted(
        b, s, v, 0.7, keep_n, use_kernel=False))
    ik, rk = jax.tree.map(np.asarray, f_k(bT, sc, valid))
    iw, rw = jax.tree.map(np.asarray, f_w(bT, sc, valid))
    same = np.array_equal(ik[rk], iw[rw]) and np.array_equal(rk, rw)
    print(f"kernel vs while-loop keep sets: "
          f"{'IDENTICAL' if same else 'MISMATCH'} "
          f"({int(rk.sum())} vs {int(rw.sum())} kept); "
          f"first diffs {[(int(a), int(b)) for a, b in zip(ik[:10], iw[:10]) if a != b][:5]}; "
          f"{time.time() - t0:.0f}s", flush=True)
    jax.clear_caches()


def main():
    sys.path.insert(0, "/root/repo/tools")
    nms_kernel_device_parity()
    run(["--family", "dcn", "--mode", "bwd", "--batch", "1", "4",
         "--legs", "full", "f_res4", "f_res5", "f_head", "f_all", "fwd_only"])
    run(["--family", "dcn", "--mode", "bwd", "--batch", "4",
         "--legs", "full", "f_res4", "f_res5"], vjp_mode="autodiff")
    run(["--family", "dcn", "--mode", "fwd", "--no-grad", "--batch", "4",
         "--cuts", "sample", "feat", "pool", "head", ""], vjp_mode="scatter")
    run(["--mode", "fwd", "--no-grad", "--batch", "8",
         "--cuts", "head", "lnms_score", "lnms_target", ""])
    run(["--family", "fpn", "--mode", "bwd", "--batch", "4",
         "--legs", "full", "f_neck", "f_all", "fwd_only"])
    # Pallas geom-bias/attention in the TRAIN graph (the dense XLA branch is
    # 12.9 ms/img; the predict-graph poison measurement may not transfer)
    run(["--family", "fpn", "--mode", "bwd", "--batch", "4",
         "--legs", "full", "f_all", "fwd_only",
         "--set", "TPU.FPN_ALLOW_PALLAS=True"])


if __name__ == "__main__":
    main()
