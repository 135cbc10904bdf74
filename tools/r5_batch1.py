"""Round-5 TPU measurement batch 1 — ONE process (the axon tunnel wedges
~15 min on process exit, so every hardware number this round rides a single
interpreter; CLAUDE.md 'Environment facts').

Sequence (round-4 verdict tasks 2, 3, 7, 8):
  1. DCN  bwd legs, scatter default, B=1,4   (task 2: first scatter-mode legs)
  2. DCN  forward-only cuts, B=4             (task 2: explain fwd 15.06 vs 6.47)
  3. FPN  bwd legs (cached-proposal step), B=1,4     (task 3)
  4. flagship forward-only cuts, B=8         (task 8: fwd_only 6.04 anatomy)
  5. flagship bwd legs, B=8                  (task 8 baseline at best batch)
  6. train-from-files, flagship B=8          (task 7: loader vs step wall)

Each stage is the existing tool invoked in-process with patched argv.
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
    microbench_train_cuts.main()
    print(f"===== done in {time.time() - t0:.0f}s =====", flush=True)
    jax.clear_caches()


def run_files(argv):
    import jax
    import bench_train_files
    print(f"\n===== bench_train_files {' '.join(argv)} =====", flush=True)
    t0 = time.time()
    sys.argv = ["bench_train_files.py"] + argv
    bench_train_files.main()
    print(f"===== done in {time.time() - t0:.0f}s =====", flush=True)
    jax.clear_caches()


def split3_device_parity():
    """ADVICE r4 #4: the split3 stage-2 Pallas NMS sweep path only exists on
    TPU, so the CPU parity test exercises the while-loop fallback — run the
    device-side dets comparison (split3 vs single fused module) once here."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_cfg
    from relation_tpu.core.trainer import build_model
    from relation_tpu.core.predictor import (make_predict_fn,
                                             make_predict_fn_split3)

    print("\n===== split3 on-device parity =====", flush=True)
    t0 = time.time()
    cfg = _flagship_cfg()
    cfg.symbol = ("resnet_v1_101_rcnn_fpn_attention_1024_pairwise_"
                  "position_multi_head_16_learn_nms")
    cfg.network.ANCHOR_SCALES = (8,)
    cfg.network.NUM_ANCHORS = 3
    model = build_model(cfg)
    H, W = 608, 1024
    n0 = int(cfg.TEST.FIRST_N) + 1
    rois0 = jnp.tile(jnp.asarray([[0.0, 0.0, 32.0, 32.0]]), (n0, 1))
    im_info = jnp.asarray([600.0, 1000.0, 1.667], jnp.float32)
    image = jnp.asarray(
        np.random.RandomState(3).randn(12, H // 2, W // 2)
        .astype(np.float32) * 40)
    params = jax.jit(model.init, static_argnums=(4,))(
        jax.random.PRNGKey(0), image, rois0, im_info, n0)["params"]

    one = make_predict_fn(model, cfg, (H // 16, W // 16))
    three = make_predict_fn_split3(model, cfg, (H // 16, W // 16))
    d1 = np.asarray(one(params, image, im_info)["dets"])
    d3 = np.asarray(three(params, image, im_info)["dets"])
    n_match = int(np.sum(np.all(np.isclose(d1, d3, rtol=1e-3, atol=1e-3),
                                axis=1)))
    print(f"split3 parity: {n_match}/{len(d1)} det rows match "
          f"(max abs diff {np.max(np.abs(d1 - d3)):.2e}); "
          f"{time.time() - t0:.0f}s", flush=True)
    jax.clear_caches()


def main():
    sys.path.insert(0, "/root/repo/tools")
    # flagship first: its programs compiled fastest in round 4, so a dead
    # tunnel or a compile stall is visible within minutes, before the
    # expensive DCN/FPN legs
    run(["--mode", "fwd", "--no-grad", "--batch", "8"])
    run(["--mode", "bwd", "--batch", "8"])
    run(["--family", "dcn", "--mode", "bwd", "--batch", "1", "4"])
    run(["--family", "dcn", "--mode", "fwd", "--no-grad", "--batch", "4"])
    run(["--family", "fpn", "--mode", "bwd", "--batch", "1", "4"])
    run(["--family", "fpn", "--mode", "fwd", "--no-grad", "--batch", "4"])
    split3_device_parity()
    run_files(["--n", "192", "--batch", "8", "--workers", "4"])


if __name__ == "__main__":
    main()
