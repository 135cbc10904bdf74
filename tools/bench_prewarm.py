"""Can the 3 per-bucket XLA compiles overlap? (multi-bucket cold-start fix)

tools/bench_multibucket.py measured the cold multi-bucket eval walled by
serial per-bucket compiles (39 + 26 + 24 s), and the persistent compile cache
does not help through this environment's tunnel. If compilation is mostly
off-GIL (XLA C++ / tunnel RPC), firing the three bucket compiles from three
Python threads overlaps them — the reference never pays this (MutableModule
rebinds executors cheaply, core/module.py:1041-1074), so the static-bucket
design must win back the difference at startup.

Measures: serial wall vs threaded wall for compiling the flagship predict fn
at the 3 production buckets (first call with placeholder device arrays — this
populates the SAME jit cache pred_eval uses, unlike AOT .lower().compile()).

Usage: python tools/bench_prewarm.py
"""

from __future__ import annotations

import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_cfg
    from relation_tpu.core.trainer import build_model
    from relation_tpu.core.predictor import make_predict_fn

    cfg = _flagship_cfg()
    buckets = [tuple(b) for b in cfg.TPU.IMAGE_BUCKETS]
    model = build_model(cfg)

    H0, W0 = buckets[0]
    # jit the init: eager flax init dispatches ~600 ops one by one (~5 min
    # through the async tunnel); one compiled program is seconds
    params = jax.jit(model.init, static_argnums=(4,))(
        jax.random.PRNGKey(0),
        jnp.zeros((12, H0 // 2, W0 // 2), jnp.float32),
        jnp.tile(jnp.asarray([[0.0, 0.0, 32.0, 32.0]]), (101, 1)),
        jnp.asarray([float(H0), float(W0), 1.0]), 101)["params"]
    params = jax.device_put(params)

    def warm_one(hw):
        H, W = hw
        fn = make_predict_fn(model, cfg, (H // 16, W // 16))
        img = jnp.zeros((12, H // 2, W // 2), jnp.uint8)
        out = fn(params, img, jnp.asarray([float(H), float(W), 1.0]))
        jax.block_until_ready(out["dets"])

    # serial
    t0 = time.perf_counter()
    per = []
    for hw in buckets:
        t1 = time.perf_counter()
        warm_one(hw)
        per.append(time.perf_counter() - t1)
    serial = time.perf_counter() - t0
    print(f"serial: {serial:.1f}s  per-bucket {[f'{p:.1f}' for p in per]}")

    # threaded (fresh jit instances -> fresh compiles; same process, so the
    # dispatch/tracing layer is warm in both leg)
    threads = [threading.Thread(target=warm_one, args=(hw,)) for hw in buckets]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    threaded = time.perf_counter() - t0
    print(f"threaded: {threaded:.1f}s  speedup {serial / threaded:.2f}x")
    import json
    print(json.dumps({"metric": "bucket_prewarm", "serial_s": round(serial, 1),
                      "threaded_s": round(threaded, 1),
                      "speedup": round(serial / threaded, 2)}))


if __name__ == "__main__":
    main()
