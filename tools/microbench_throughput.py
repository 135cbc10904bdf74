"""Sustained inference throughput through the async dispatch pipeline.

Latency (bench.py) chains executions with a data dependency; here instead we
dispatch N independent predict calls and fetch at the end — the evaluator's
real operating mode (core/evaluator.py keeps a window of in-flight results).
This measures whether host dispatch through the tunnel can keep the chip fed,
i.e. the images/sec ceiling of pred_eval, not just device latency.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def main():
    from __graft_entry__ import entry

    fn, (params, image, im_info) = entry()
    rng = np.random.RandomState(0)
    jfn = jax.jit(fn)

    imgs = [jnp.asarray(rng.randn(*image.shape).astype(np.float32) * 40)
            for _ in range(8)]
    # warm + compile
    out = jfn(params, imgs[0], im_info)
    np.asarray(out)

    n = 200
    for label, async_copy in (("blocking fetches", False),
                              ("async D2H (evaluator mode)", True)):
        t0 = time.perf_counter()
        outs = []
        for i in range(n):
            o = jfn(params, imgs[i % 8], im_info)
            if async_copy and hasattr(o, "copy_to_host_async"):
                o.copy_to_host_async()
            outs.append(o)
        for o in outs:
            np.asarray(o)
        dt = time.perf_counter() - t0
        print(f"throughput [{label}]: {n / dt:.1f} images/s "
              f"({dt / n * 1e3:.2f} ms/image sustained; "
              f"device time ~3.2 ms)")


if __name__ == "__main__":
    main()
