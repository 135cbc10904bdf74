"""Round-5 TPU measurement batch 4 — ONE process (see r5_batch1.py).

  1. DCN with TPU.DCN_POOL_DTYPE=bfloat16 (new default): the deformable-PSROI
     head backward measured 7.99 ms/img at B=4 in f32 (r5_batch3).
  2. FPN B=4 with HEAD_DTYPE=bfloat16 on top of FPN_ALLOW_PALLAS=lnms.
  3. Inference regression sweep: bench.py flagship e2e + DCN/FPN variants
     (the learned-NMS rank gathers are now one-hot matmuls in the forward,
     and DCN PSROI pools default to bf16 — both touch the predict graphs).
"""

import json
import subprocess
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
    sys.argv = ["bench_variants.py"] + labels      # positional substring filters
    try:
        bench_variants.main()
    except Exception as e:
        print(f"VARIANTS FAILED: {type(e).__name__}: {e}", flush=True)
    print(f"===== done in {time.time() - t0:.0f}s =====", flush=True)
    jax.clear_caches()


def run_bench():
    import jax
    print("\n===== bench.py flagship e2e =====", flush=True)
    t0 = time.time()
    import importlib.util
    spec = importlib.util.spec_from_file_location("bench_main",
                                                  "/root/repo/bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.argv = ["bench.py"]
    try:
        spec.loader.exec_module(mod)
        mod.main()
    except SystemExit:
        pass
    except Exception as e:
        print(f"BENCH FAILED: {type(e).__name__}: {e}", flush=True)
    print(f"===== done in {time.time() - t0:.0f}s =====", flush=True)
    jax.clear_caches()


def main():
    sys.path.insert(0, "/root/repo/tools")
    run(["--family", "dcn", "--mode", "bwd", "--batch", "1", "4",
         "--legs", "full", "f_res5", "f_head", "fwd_only"], vjp_mode="kernel")
    run(["--family", "fpn", "--mode", "bwd", "--batch", "4",
         "--legs", "full", "fwd_only",
         "--set", "TPU.FPN_ALLOW_PALLAS='lnms'", "TPU.HEAD_DTYPE='bfloat16'"])
    run_bench()
    run_variants(["flagship", "dcn_relation", "fpn_relation"])


if __name__ == "__main__":
    main()
