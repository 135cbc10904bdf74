"""Gathers with matmul backward passes.

The learned-NMS head gathers per-class rank-ordered rows (reference
``mx.sym.take``/``pick`` over the per-class argsort, symbols/..._learn_nms.py:
442-474). XLA's generic VJP for a gather is a scatter-add, which serializes on
TPU — measured 0.68 ms/step for the [first_n, C, 128] -> [N, 128] rank-gather
backward in the flagship train step. Selection backward is algebraically a
0/1 matmul: d_x = onehot(idx)^T g rides the MXU instead (~50 us at the same
shape). Forward stays the plain gather, so inference graphs (and the golden
end-to-end fixtures) are bit-identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _float0_like(idx):
    return np.zeros(idx.shape, jax.dtypes.float0)


@jax.custom_vjp
def take_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x [N, D], idx [..., ] int -> x[idx] [..., D]; backward is a one-hot
    matmul instead of a scatter-add."""
    return x[idx]


def _tr_fwd(x, idx):
    return x[idx], (idx, x.shape[0])


def _tr_bwd(res, g):
    idx, n = res
    oh = jax.nn.one_hot(idx.reshape(-1), n, dtype=g.dtype)      # [K, N]
    dx = jax.lax.dot_general(oh, g.reshape(oh.shape[0], -1),
                             (((0,), (0,)), ((), ())))           # [N, D]
    return dx, _float0_like(idx)


take_rows.defvjp(_tr_fwd, _tr_bwd)


@jax.custom_vjp
def take_along0(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """take_along_axis(x [N, C], idx [F, C], axis=0) -> [F, C]; backward is a
    one-hot contraction instead of a scatter-add."""
    return jnp.take_along_axis(x, idx, axis=0)


def _ta_fwd(x, idx):
    return jnp.take_along_axis(x, idx, axis=0), (idx, x.shape[0])


def _ta_bwd(res, g):
    idx, n = res
    oh = jax.nn.one_hot(idx, n, dtype=g.dtype)                  # [F, C, N]
    dx = jnp.einsum("fcn,fc->nc", oh, g)
    return dx, _float0_like(idx)


take_along0.defvjp(_ta_fwd, _ta_bwd)
