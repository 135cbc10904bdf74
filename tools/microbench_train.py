"""Train-step latency on the real TPU chip: flagship model, one 608x1024 image.

The full reference training step (backbone fwd+bwd, RPN, on-device proposals
with 6000-box NMS, proposal_target sampling, relation head, learned-NMS head
with nms_multi_target matching, OHEM, losses, SGD update) as ONE jit region —
the TPU-native replacement for the reference's executor forward/backward + 4
CustomOp host round-trips + kvstore update (train_end2end.py, module.py:993-1038).

Reference scale for context: 4x Titan X, ~1.1 s/step at batch 4 (1 image/GPU,
8 epochs over ~120k images in ~2 days per the paper's setup) — i.e. ~275 ms
per image-step per GPU.

Usage: python tools/microbench_train.py [--batch 1 2 4]
  (the reference trains BATCH_IMAGES=1 per GPU x 4 GPUs; B>1 here is the
  single-chip scaling curve for the samples/sec row in BASELINE.md)
"""
import argparse
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[1])
    args = ap.parse_args()
    # compile cache is OPT-IN here: through the axon tunnel a warm cache
    # measured SLOWER first-calls than cold (BASELINE.md round 3), which
    # distorts the cold-start component of these numbers
    from relation_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache(os.environ.get("RELATION_TPU_COMPILE_CACHE", ""))
    from __graft_entry__ import _flagship_cfg
    from relation_tpu.core.trainer import (build_model, make_train_step,
                                           create_train_state)

    cfg = _flagship_cfg()
    # timing-run numerics: the reference never trains from random init (always
    # ImageNet-pretrained, train_end2end.py); at lr 5e-4 a random-init step on
    # a random image diverges to NaN by step 2. Tiny lr + grad clip keep the
    # chained steps finite without changing the timed computation.
    cfg.TRAIN.lr = 1e-5
    cfg.TRAIN.warmup = False
    cfg.TPU.GRAD_CLIP = 1.0
    model = build_model(cfg)
    H, W = 608, 1024
    rng = np.random.RandomState(0)

    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               jnp.zeros((12, H // 2, W // 2)),
                               jnp.asarray([float(H), float(W), 1.0]))
    max_gt = int(cfg.TPU.get("MAX_GT", 100))
    step = make_train_step(model, cfg)

    import time
    # host snapshot: the donated-state buffers die inside each B's timing
    # loop, so every batch size restarts from this copy
    host_state = jax.tree.map(np.asarray, state)
    g = jax.jit(lambda a: a + 1)
    np.asarray(g(jnp.zeros(())))
    rts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(g(jnp.zeros(())))
        rts.append(time.perf_counter() - t0)
    rt = min(rts)

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

        jstep = jax.jit(step, donate_argnums=(0,))

        # Async-tunnel methodology: each step's state depends on the previous
        # one, so chaining N dispatches and fetching once serializes real
        # executions; subtract the measured fetch round trip.
        st2, m = jstep(jax.device_put(host_state), batch)  # compile + warm
        np.asarray(m["total_loss"])

        n = 20
        best = float("inf")
        cur = st2
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                cur, m = jstep(cur, batch)
            loss = float(np.asarray(m["total_loss"]))
            best = min(best, (time.perf_counter() - t0 - rt) / n * 1e3)
        print(f"train step (B={B}, 608x1024, e2e incl. learned NMS): "
              f"{best:.2f} ms  ({B * 1e3 / best:.1f} img/s, loss={loss:.3f})")
        if B == 1:
            print(f"reference scale: ~275 ms/image-step on one Titan X -> "
                  f"{275.0 / best:.0f}x")


if __name__ == "__main__":
    main()
