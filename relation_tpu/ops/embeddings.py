"""Geometric / rank sinusoidal embeddings and pairwise position matrices.

These are the in-graph geometry features of the relation module and the learned-NMS
head. Formula parity with the reference matters down to constants (the 100x position
scaling, wave_length=1000, the 1e-3 log clamp):

 - extract_position_matrix        reference symbols/..._learn_nms.py:52-88
 - extract_position_embedding    reference symbols/..._learn_nms.py:35-49
 - extract_rank_embedding        reference symbols/resnet_v1_101_rcnn_learn_nms_base.py:166-187
 - extract_multi_position_matrix reference ...learn_nms_base.py:249-289
 - extract_pairwise_multi_position_embedding  ...learn_nms_base.py:224-246
"""

from __future__ import annotations

import jax.numpy as jnp


def _sinusoid(x: jnp.ndarray, feat_dim: int, num_fields: int,
              wave_length: float = 1000.0) -> jnp.ndarray:
    """Shared sin/cos expansion. x: [..., num_fields] -> [..., feat_dim].

    Each field gets feat_dim/(2*num_fields) frequencies; sin block then cos block are
    concatenated per field (matching mx.sym.concat(sin, cos, dim=-1) then reshape).
    """
    per = feat_dim // (2 * num_fields)
    feat_range = jnp.arange(per, dtype=jnp.float32)
    dim_mat = jnp.power(wave_length, (2.0 * num_fields / feat_dim) * feat_range)
    div = x[..., None] / dim_mat                                # [..., F, per]
    emb = jnp.concatenate([jnp.sin(div), jnp.cos(div)], axis=-1)  # [..., F, 2*per]
    return emb.reshape(x.shape[:-1] + (feat_dim,))


def extract_position_matrix(bbox: jnp.ndarray, nongt_dim: int) -> jnp.ndarray:
    """Pairwise log-space geometry features for the relation module.

    bbox: [N, 4] -> [N, nongt_dim, 4] of (log|dx/w|, log|dy/h|, log(w/w'), log(h/h')),
    keys restricted to the first nongt_dim boxes (the non-gt proposals).
    Mirrors reference symbols/..._learn_nms.py:52-88.
    """
    xmin, ymin, xmax, ymax = (bbox[:, i] for i in range(4))
    # clamp: degenerate boxes (exp-underflowed widths from extreme regression
    # deltas) would otherwise divide by ~0 here and poison the graph with NaN;
    # the reference's numpy path has the same latent hazard but never hits it
    # because it always starts from pretrained weights
    w = jnp.maximum(xmax - xmin + 1.0, 1e-3)
    h = jnp.maximum(ymax - ymin + 1.0, 1e-3)
    cx = 0.5 * (xmin + xmax)
    cy = 0.5 * (ymin + ymax)

    dx = (cx[:, None] - cx[None, :]) / w[:, None]
    dx = jnp.log(jnp.maximum(jnp.abs(dx), 1e-3))
    dy = (cy[:, None] - cy[None, :]) / h[:, None]
    dy = jnp.log(jnp.maximum(jnp.abs(dy), 1e-3))
    dw = jnp.log(w[:, None] / w[None, :])
    dh = jnp.log(h[:, None] / h[None, :])
    pos = jnp.stack([dx, dy, dw, dh], axis=2)                  # [N, N, 4]
    return pos[:, :nongt_dim, :]


def extract_position_embedding(position_mat: jnp.ndarray,
                               feat_dim: int = 64,
                               wave_length: float = 1000.0) -> jnp.ndarray:
    """Sinusoid over 100x-scaled position matrix.

    position_mat: [N, K, 4] -> [N, K, feat_dim].
    Mirrors reference symbols/..._learn_nms.py:35-49.
    """
    return _sinusoid(100.0 * position_mat, feat_dim, num_fields=4,
                     wave_length=wave_length)


def extract_rank_embedding(rank_dim: int, feat_dim: int,
                           wave_length: float = 1000.0) -> jnp.ndarray:
    """Sinusoid over the integer rank. -> [rank_dim, feat_dim].

    Mirrors reference ...learn_nms_base.py:166-187 (note: single field, feat_dim/2
    frequencies, no 100x scaling).
    """
    rank = jnp.arange(rank_dim, dtype=jnp.float32)
    return _sinusoid(rank[:, None], feat_dim, num_fields=1, wave_length=wave_length)


def extract_multi_position_matrix(bbox: jnp.ndarray) -> jnp.ndarray:
    """Per-class pairwise geometry for the learned-NMS attention.

    bbox: [N, num_fg_classes, 4] -> [num_fg_classes, N, N, 4].
    Mirrors reference ...learn_nms_base.py:249-289.
    """
    b = jnp.transpose(bbox, (1, 0, 2))                          # [C, N, 4]
    xmin, ymin, xmax, ymax = (b[..., i] for i in range(4))
    w = jnp.maximum(xmax - xmin + 1.0, 1e-3)   # degenerate-box guard (see above)
    h = jnp.maximum(ymax - ymin + 1.0, 1e-3)
    cx = 0.5 * (xmin + xmax)
    cy = 0.5 * (ymin + ymax)

    dx = (cx[:, :, None] - cx[:, None, :]) / w[:, :, None]
    dx = jnp.log(jnp.maximum(jnp.abs(dx), 1e-3))
    dy = (cy[:, :, None] - cy[:, None, :]) / h[:, :, None]
    dy = jnp.log(jnp.maximum(jnp.abs(dy), 1e-3))
    dw = jnp.log(w[:, :, None] / w[:, None, :])
    dh = jnp.log(h[:, :, None] / h[:, None, :])
    return jnp.stack([dx, dy, dw, dh], axis=3)                  # [C, N, N, 4]


def extract_pairwise_multi_position_embedding(position_mat: jnp.ndarray,
                                              feat_dim: int,
                                              wave_length: float = 1000.0,
                                              dtype=None) -> jnp.ndarray:
    """Sinusoid over the per-class pairwise geometry (100x scaling).

    position_mat: [C, N, N, 4] -> [C, N, N, feat_dim].
    Mirrors reference ...learn_nms_base.py:224-246. ``dtype=bfloat16`` halves the
    HBM traffic of the large intermediate (it feeds a Dense that tolerates bf16).
    """
    out = _sinusoid(100.0 * position_mat, feat_dim, num_fields=4,
                    wave_length=wave_length)
    return out.astype(dtype) if dtype is not None else out


def extract_position_matrix_t(bbox: jnp.ndarray, nongt_dim: int) -> jnp.ndarray:
    """Field-major pairwise geometry for the fused bias kernel: [4, N, nongt_dim]."""
    return jnp.transpose(extract_position_matrix(bbox, nongt_dim), (2, 0, 1))


def extract_multi_position_matrix_t(bbox: jnp.ndarray) -> jnp.ndarray:
    """Field-major per-class pairwise geometry: [C, 4, N, N]
    (same values as extract_multi_position_matrix, laid out for the fused
    geometric-bias kernel)."""
    return jnp.transpose(extract_multi_position_matrix(bbox), (0, 3, 1, 2))
