"""Pallas kernel parity tests (interpret mode on the CPU test platform)."""

import numpy as np
import jax
import jax.numpy as jnp

from relation_tpu.ops.pallas.geom_bias import (fused_geometric_bias,
                                               geom_bias_reference)
from relation_tpu.ops.pallas.nms_attention import (
    fused_nms_relation_attention, nms_relation_attention_reference)


def test_geom_bias_matches_reference(rng):
    C, N = 3, 16
    pos = jnp.asarray((rng.randn(C, 4, N, N) * 1.5).astype(np.float32))
    W = jnp.asarray((rng.randn(64, 8) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.randn(8).astype(np.float32) * 0.01)
    got = np.asarray(fused_geometric_bias(pos, W, b))
    want = np.asarray(geom_bias_reference(pos, W, b))
    # compare in the acc domain (the actual multiplicative attention weight);
    # log-domain differences near the 1e-6 clamp are attention-irrelevant
    np.testing.assert_allclose(np.exp(got), np.exp(want), rtol=5e-3, atol=2e-3)


def test_geom_bias_gradient_matches(rng):
    C, N = 2, 8
    pos = jnp.asarray((rng.randn(C, 4, N, N)).astype(np.float32))
    W = jnp.asarray((rng.randn(64, 4) * 0.1).astype(np.float32))
    b = jnp.asarray(np.zeros(4, np.float32))
    g1 = jax.grad(lambda w: jnp.sum(fused_geometric_bias(pos, w, b)))(W)
    g2 = jax.grad(lambda w: jnp.sum(geom_bias_reference(pos, w, b)))(W)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4,
                               atol=1e-4)


def test_fused_nms_attention_matches_reference(rng):
    C, N, G, dqk, F, E = 3, 12, 4, 8, 16, 4
    pos = jnp.asarray((rng.randn(C, 4, N, N)).astype(np.float32))
    q = jnp.asarray(rng.randn(C, N, G * dqk).astype(np.float32))
    k = jnp.asarray(rng.randn(C, N, G * dqk).astype(np.float32))
    v = jnp.asarray(rng.randn(C, N, F).astype(np.float32))
    wg = jnp.asarray((rng.randn(64, G) * 0.1).astype(np.float32))
    bg = jnp.asarray(np.zeros(G, np.float32))
    wl = jnp.asarray((rng.randn(G, F, E) * 0.1).astype(np.float32))
    got = np.asarray(fused_nms_relation_attention(pos, q, k, v, wg, bg, wl))
    want = np.asarray(nms_relation_attention_reference(pos, q, k, v, wg, bg, wl))
    assert got.shape == (C, N, G * E)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_fused_nms_attention_gradients(rng):
    C, N, G, dqk, F, E = 2, 6, 2, 4, 8, 4
    pos = jnp.asarray((rng.randn(C, 4, N, N)).astype(np.float32))
    q = jnp.asarray(rng.randn(C, N, G * dqk).astype(np.float32))
    k = jnp.asarray(rng.randn(C, N, G * dqk).astype(np.float32))
    v = jnp.asarray(rng.randn(C, N, F).astype(np.float32))
    wg = jnp.asarray((rng.randn(64, G) * 0.1).astype(np.float32))
    bg = jnp.asarray(np.zeros(G, np.float32))
    wl = jnp.asarray((rng.randn(G, F, E) * 0.1).astype(np.float32))

    def loss_fused(q, v, wl):
        return jnp.sum(fused_nms_relation_attention(pos, q, k, v, wg, bg, wl) ** 2)

    def loss_ref(q, v, wl):
        return jnp.sum(nms_relation_attention_reference(pos, q, k, v, wg, bg,
                                                        wl) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, v, wl)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, v, wl)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-3)
