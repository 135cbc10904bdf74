"""Minimal TPU-tunnel liveness probe: one scalar roundtrip, then exit 0.

A dead/wedged axon tunnel hangs the first dispatch forever (no UNAVAILABLE,
just silence) — run under `timeout 180` and treat a nonzero rc as 'tunnel
down'. Each probe process's exit itself wedges the tunnel ~15 min (CLAUDE.md),
so poll at >= 20 min spacing and leave >= 16 min between a successful probe
and the real measurement process.
"""
import numpy as np
import jax
import jax.numpy as jnp

x = np.asarray(jax.jit(lambda a: a + 1)(jnp.zeros(())))
assert x == 1.0
print("TUNNEL_OK", jax.devices(), flush=True)
