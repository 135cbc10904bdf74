"""Honest TPU micro-timer for this environment's async tunnel.

Methodology: chain n executions inside one jitted lax.scan; each iteration's
input is perturbed by a tiny per-iteration constant (not foldable, so no DCE
or CSE across iterations); each iteration emits a scalar that is collected in
the scan outputs (so every iteration's work is live); only the scalars are
fetched. Per-iter time = (total - round_trip) / n, best of k.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit_us(fn, x, *rest, n=100, k=5, feedback=None):
    """Time fn(x, *rest) per call in microseconds, serial-chained.

    Each iteration's input is the magnitude-normalized previous output mapped
    back to x's shape (default: broadcast-scale x by a data-dependent scalar).
    This defeats every XLA simplification that plagues naive timing loops here:
    slice-pushdown (a [0] liveness scalar computes one element), sum-factoring
    (sum(A@B) = rowsum.colsum), and distribution/hoisting of additive or
    multiplicative loop-invariant perturbations through linear ops — because
    iteration i+1's input genuinely depends on iteration i's full output
    through a nonlinearity. Cost: one extra reduction + scale pass per iter.
    """
    if feedback is None:
        def feedback(y, x):
            # roll x by a shift derived from y: a data-dependent permutation.
            # Magnitude-stable, and no algebraic rewrite can hoist fn out of
            # the loop (scalar multiply/add feedbacks distribute through
            # linear fns and collapse to one real evaluation).
            t = jnp.sum(jnp.abs(y.astype(jnp.float32)))
            t = jnp.where(jnp.isfinite(t), t, 1.0)
            shift = (jnp.mod(t, 61.0)).astype(jnp.int32) + 1
            return jnp.roll(x.reshape(-1), shift).reshape(x.shape)

    def chained(x, *rest):
        def body(x, _):
            y = fn(x, *rest)
            return feedback(y, x), ()
        xf, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(jnp.abs(fn(xf, *rest).astype(jnp.float32)))
    jfn = jax.jit(chained)
    _ = np.asarray(jfn(x, *rest))
    g = jax.jit(lambda a: a + 1)
    _ = np.asarray(g(jnp.zeros(())))
    rts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(g(jnp.zeros(())))
        rts.append((time.perf_counter() - t0) * 1e3)
    rt = min(rts)
    best = float("inf")
    for _ in range(k):
        t0 = time.perf_counter()
        _ = np.asarray(jfn(x, *rest))
        best = min(best, (time.perf_counter() - t0) * 1e3)
    return max(best - rt, 0.0) / n * 1e3


def main():
    rng = np.random.RandomState(0)
    bf = jnp.bfloat16
    nhwc = jnp.asarray(rng.randn(1, 608, 1024, 3).astype(np.float32)).astype(bf)
    nchw = jnp.asarray(rng.randn(1, 3, 608, 1024).astype(np.float32)).astype(bf)
    flat = jnp.asarray(rng.randn(608 * 1024 * 3).astype(np.float32)).astype(bf)
    big = jnp.asarray(rng.randn(1, 38, 64, 1024).astype(np.float32)).astype(bf)
    w3 = jnp.asarray(rng.randn(3, 3, 1024, 1024).astype(np.float32) * .02).astype(bf)
    m4 = jnp.asarray(rng.randn(4096, 4096).astype(np.float32)).astype(bf)

    print("mul nhwc [608,1024,3] %9.1f us (dense ideal ~9)" %
          timeit_us(lambda x: x * 1.0001, nhwc))
    print("mul nchw [3,608,1024] %9.1f us (dense ideal ~9)" %
          timeit_us(lambda x: x * 1.0001, nchw))
    print("mul flat              %9.1f us (dense ideal ~9)" %
          timeit_us(lambda x: x * 1.0001, flat))
    print("conv3x3 1024ch        %9.1f us (MXU ideal ~233)" %
          timeit_us(lambda x: jax.lax.conv_general_dilated(
              x, w3, (1, 1), ((1, 1), (1, 1)),
              dimension_numbers=("NHWC", "HWIO", "NHWC"),
              preferred_element_type=bf), big))
    print("4k matmul bf16        %9.1f us (MXU ideal ~700)" %
          timeit_us(lambda a: jnp.dot(a, m4, preferred_element_type=bf), m4))


if __name__ == "__main__":
    main()
