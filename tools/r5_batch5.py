"""Round-5 TPU measurement batch 5 — ONE process (see r5_batch1.py).

  1. DCN legs with the w-first PSROI contraction order (contract the larger
     spatial axis first; the head backward leg sat at 7.89 ms/img).
  2. Flagship final batch-scaling table (full leg at B=1,2,4,8) for the
     round's BASELINE row.
  3. DCN inference variant re-check (w-first changes the inference graph).
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
    except Exception as e:
        print(f"LEG FAILED: {type(e).__name__}: {e}", flush=True)
    print(f"===== done in {time.time() - t0:.0f}s =====", flush=True)
    jax.clear_caches()


def run_variants(labels):
    import jax
    import bench_variants
    print(f"\n===== bench_variants {labels} =====", flush=True)
    t0 = time.time()
    sys.argv = ["bench_variants.py"] + labels
    try:
        bench_variants.main()
    except Exception as e:
        print(f"VARIANTS FAILED: {type(e).__name__}: {e}", flush=True)
    print(f"===== done in {time.time() - t0:.0f}s =====", flush=True)
    jax.clear_caches()


def main():
    sys.path.insert(0, "/root/repo/tools")
    run(["--family", "dcn", "--mode", "bwd", "--batch", "1", "4",
         "--legs", "full", "f_res5", "f_head", "fwd_only"], vjp_mode="kernel")
    run(["--mode", "bwd", "--batch", "1", "2", "4", "8", "--legs", "full"])
    run_variants(["dcn_relation"])


if __name__ == "__main__":
    main()
