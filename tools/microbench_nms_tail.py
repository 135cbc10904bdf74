"""Learned-NMS attention tail (XLA-only dense vs class-gather compact).

The FPN graph must stay pallas-free (s2b poison, CLAUDE.md), so its
learned-NMS tail runs the pure-XLA dense attention: geometry sinusoid
[C, 64, N, N] -> bias -> softmax -> attention, ~2.3 ms of the 7.6 ms FPN e2e
at the dense worst case (every class active). Real trained-COCO images keep
5-20 classes above TEST.LEARN_NMS_CLASS_SCORE_TH=0.01 (reference
operator_py/learn_nms.py:296-309 shrinks its attention batch the same way) —
the compact path (models/relation.py compact_classes) gathers the active
classes into an [m, ...] batch first.

This bench times the tail module in isolation at the production operating
point (C=79, N=100, dim_qk=1024). Timing uses a tuple-carry scan: BOTH feat
and pos_t are data-dependently perturbed each iteration — with pos_t held
loop-invariant XLA hoists the whole sinusoid/bias computation (the expensive
part) out of the scan and the un-cond'd dense path reads 10x fast. Run on TPU.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from relation_tpu.models.relation import NMSRelationModule  # noqa: E402


def timeit_pair_us(fn, feat, pos_t, active, n=50, k=3):
    """Serial-chained timer with a (feat, pos_t) tuple carry (see
    tools/microbench.py for the methodology; this variant exists because the
    single-carry helper leaves pos_t loop-invariant and XLA hoists the
    geometry bias out of the loop)."""
    def body(carry, _):
        f, p = carry
        y = fn(f, p, active)
        t = jnp.sum(jnp.abs(y.astype(jnp.float32)))
        t = jnp.where(jnp.isfinite(t), t, 1.0)
        shift = (jnp.mod(t, 61.0)).astype(jnp.int32) + 1
        f2 = jnp.roll(f.reshape(-1), shift).reshape(f.shape)
        p2 = jnp.roll(p.reshape(-1), shift).reshape(p.shape)
        return (f2, p2), ()

    def chained(feat, pos_t):
        (f, p), _ = jax.lax.scan(body, (feat, pos_t), None, length=n)
        return jnp.sum(jnp.abs(fn(f, p, active).astype(jnp.float32)))

    jfn = jax.jit(chained)
    _ = np.asarray(jfn(feat, pos_t))
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
        _ = np.asarray(jfn(feat, pos_t))
        best = min(best, (time.perf_counter() - t0) * 1e3)
    return max(best - rt, 0.0) / n * 1e3


def main():
    C, N, F = 79, 100, 128
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(N, C, F).astype(np.float32))
    pos_t = jnp.asarray(rng.uniform(-4, 4, (C, 4, N, N)).astype(np.float32))

    for name, m, n_active, emb_dtype in [
        ("dense (m=0, worst case)", 0, C, jnp.bfloat16),
        ("compact m=32, 16 active", 32, 16, jnp.bfloat16),
        ("compact m=32, 79 active (cond->dense)", 32, C, jnp.bfloat16),
        ("compact m=32, 16 active, f32 sinusoid", 32, 16, None),
    ]:
        mod = NMSRelationModule(index=1, groups=16, dim_qk=1024, dim_out=128,
                                allow_pallas=False, compact_classes=m,
                                geom_emb_dtype=emb_dtype)
        active = jnp.asarray((np.arange(C) < n_active).astype(np.int32))
        params = jax.jit(mod.init)(jax.random.PRNGKey(0), feat, pos_t,
                                   active=active)

        def fn(feat, pos_t, active, params=params, mod=mod):
            y, _ = mod.apply(params, feat, pos_t, active=active)
            return y

        us = timeit_pair_us(fn, feat, pos_t, active, n=50, k=3)
        print(f"{name:42s} {us:8.1f} us")


if __name__ == "__main__":
    main()
