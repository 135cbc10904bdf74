"""Round-5 TPU measurement batch 6 — ONE process (see r5_batch1.py).

Flagship learned-NMS branch anatomy (the 4.1 ms/img floor: fwd 1.83 +
bwd 2.31 at B=8): embed | attn | logit sub-cuts, forward-only AND with
gradients, to name where the remaining budget sits.
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def run(argv):
    import jax
    import microbench_train_cuts
    print(f"\n===== {' '.join(argv)} =====", flush=True)
    t0 = time.time()
    sys.argv = ["microbench_train_cuts.py"] + argv
    try:
        microbench_train_cuts.main()
    except Exception as e:
        print(f"LEG FAILED: {type(e).__name__}: {e}", flush=True)
    print(f"===== done in {time.time() - t0:.0f}s =====", flush=True)
    jax.clear_caches()


def main():
    sys.path.insert(0, "/root/repo/tools")
    run(["--mode", "fwd", "--no-grad", "--batch", "8",
         "--cuts", "head", "lnms_embed", "lnms_attn", "lnms_score", ""])
    run(["--mode", "fwd", "--batch", "8",
         "--cuts", "head", "lnms_embed", "lnms_attn", "lnms_score", ""])


def extra():
    """LNMS_ATTN=xla A/B (appended; run as `python r5_batch6.py extra`)."""
    sys.path.insert(0, "/root/repo/tools")
    run(["--mode", "bwd", "--batch", "8", "--legs", "full", "f_all",
         "--set", "TPU.LNMS_ATTN='xla'"])
    run(["--mode", "fwd", "--no-grad", "--batch", "8",
         "--cuts", "lnms_embed", "lnms_attn",
         "--set", "TPU.LNMS_ATTN='xla'"])
    run(["--mode", "bwd", "--batch", "4", "--legs", "full",
         "--set", "TPU.LNMS_ATTN='xla'"])


if __name__ == "__main__":
    import sys as _s
    (extra if "extra" in _s.argv[1:] else main)()
