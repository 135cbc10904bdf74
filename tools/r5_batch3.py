"""Round-5 TPU measurement batch 3 — ONE process (see r5_batch1.py).

A/Bs the three optimizations built from batch-1/2 legs:
  1. DCN with the fused Pallas col2im dx kernel (RELATION_TPU_DEFORM_VJP=
     kernel, now the default) — vs batch-2's scatter res5-bwd 18.5-20.2.
  2. Flagship with one-hot-matmul rank gathers in the learned-NMS branch
     (replaces vmap-batched gathers) — full leg + the lnms_score forward cut
     vs batch-2's 2.01 ms/img.
  3. FPN with TPU.FPN_ALLOW_PALLAS="lnms" (fused geometry bias in the
     learned-NMS head only; allow_pallas=True OOM'd the head relations) —
     vs 34.86 all-XLA / 32.75 the crashed all-pallas full leg.
  4. flagship HEAD_DTYPE=bfloat16 A/B at B=8 (opt-in speed knob re-measure
     on the train step).
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
    try:
        microbench_train_cuts.main()
    except Exception as e:                     # keep the batch alive
        print(f"LEG FAILED: {type(e).__name__}: {e}", flush=True)
    print(f"===== done in {time.time() - t0:.0f}s =====", flush=True)
    jax.clear_caches()


def main():
    sys.path.insert(0, "/root/repo/tools")
    # 2. flagship: one-hot lnms gathers (quick signal first)
    run(["--mode", "bwd", "--batch", "8", "--legs", "full", "f_all",
         "fwd_only"])
    run(["--mode", "fwd", "--no-grad", "--batch", "8",
         "--cuts", "head", "lnms_score", ""])
    # 1. DCN with the col2im kernel dx
    run(["--family", "dcn", "--mode", "bwd", "--batch", "1", "4",
         "--legs", "full", "f_res4", "f_res5", "f_head", "fwd_only"],
        vjp_mode="kernel")
    # 3. FPN lnms-only Pallas
    run(["--family", "fpn", "--mode", "bwd", "--batch", "1", "4",
         "--legs", "full", "f_neck", "f_all", "fwd_only",
         "--set", "TPU.FPN_ALLOW_PALLAS='lnms'"])
    # 4. flagship bf16 head A/B
    run(["--mode", "bwd", "--batch", "8", "--legs", "full",
         "--set", "TPU.HEAD_DTYPE='bfloat16'"])


if __name__ == "__main__":
    main()
