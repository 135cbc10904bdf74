"""Benchmark: flagship single-image end-to-end inference latency on one TPU chip.

Measures the full jitted pipeline — ResNet-101 backbone, RPN, on-device proposal
generation (6000-box greedy NMS), relation-augmented 2FC head, learned-NMS
duplicate-removal head, final detection selection — at the reference's eval
resolution (short side 600, bucket 608x1024).

Methodology note: this environment reaches the TPU through an async tunnel where
dispatch returns before execution and a host fetch costs ~25 ms round trip. So the
loop chains N executions with a real data dependency (the previous output perturbs
the next input) and fetches once; per-iter time = (total - round_trip) / N.

Baseline: 0.175 s/image (inference) for the same model on a Maxwell Titan X
(reference README.md "Main Results", 2FC + Relation + Learn NMS row; BASELINE.md).
Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax.numpy as jnp

import numpy as np


def _round_trip_ms():
    import jax
    import jax.numpy as jnp
    g = jax.jit(lambda a: a + 1)
    z = jnp.zeros(())
    _ = np.asarray(g(z))
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        _ = np.asarray(g(z))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import entry

    fn, (params, image, im_info) = entry()
    # a fixed pseudo-random image: an all-zeros input drives every RPN score to
    # the same constant, which makes proposal NMS pathologically slow (deep
    # suppression chains in grid order) and unrepresentative of real images
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.randn(*image.shape).astype(np.float32) * 40.0)

    def chained(params, image, im_info, n):
        def body(img, _):
            dets = fn(params, img, im_info)
            # data dependency: fold a scalar of the output back into the next
            # input. |x|*1e-30 (not 0.0*x) so no algebraic rewrite can break the
            # serialization chain; numerically invisible at image scale.
            img = img + jnp.abs(dets[0, 1]) * 1e-30
            return img, dets[0, 1]
        img, outs = jax.lax.scan(body, image, None, length=n)
        return outs[-1]

    n_iter = 50
    jfn = jax.jit(chained, static_argnums=(3,))
    # compile + warmup
    _ = np.asarray(jfn(params, image, im_info, n_iter))

    rt_ms = _round_trip_ms()
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(jfn(params, image, im_info, n_iter))
        best = min(best, (time.perf_counter() - t0) * 1e3)
    ms = max(best - rt_ms, 0.0) / n_iter

    baseline_s = 0.175  # Titan X, reference README "2FC + Relation + Learn NMS"
    print(json.dumps({
        "metric": "flagship_e2e_inference_latency",
        "value": round(ms, 3),
        "unit": "ms/image",
        "vs_baseline": round(baseline_s * 1000.0 / ms, 2),  # x-fold speedup
    }))


if __name__ == "__main__":
    main()
