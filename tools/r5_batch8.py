import sys, time
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

sys.path.insert(0, "/root/repo/tools")
# roi_align custom VJP (bf16-staged pool backward): FPN + flagship A/B
run(["--family", "fpn", "--mode", "bwd", "--batch", "1", "4",
     "--legs", "full", "f_neck", "fwd_only"])
run(["--mode", "bwd", "--batch", "8", "--legs", "full"])
run(["--family", "fpn", "--mode", "bwd", "--batch", "4",
     "--legs", "full", "--set", "TPU.FPN_ALLOW_PALLAS='lnms'"])
