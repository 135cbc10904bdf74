"""Anchor generation.

Mirrors the enumeration of the reference (lib/rpn/generate_anchor.py:22-86): ratio
enumeration with rounding around a (0,0,base-1,base-1) window, then scale enumeration.
Anchor order is ratio-major, scale-minor — parity with the reference matters because
RPN conv outputs are laid out per-anchor in this order.

Base anchors are computed in NumPy at trace time (they are compile-time constants);
the shifted full grid is built in jax.numpy so it fuses into the proposal kernel.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def generate_anchors(base_size: int = 16, ratios=(0.5, 1, 2),
                     scales=(8, 16, 32)) -> np.ndarray:
    """[A, 4] base anchors; A = len(ratios) * len(scales)."""
    ratios = np.asarray(ratios, dtype=np.float64)
    scales = np.asarray(scales, dtype=np.float64)
    base = np.array([1, 1, base_size, base_size], dtype=np.float64) - 1

    w = base[2] - base[0] + 1
    h = base[3] - base[1] + 1
    x_ctr = base[0] + 0.5 * (w - 1)
    y_ctr = base[1] + 0.5 * (h - 1)

    # ratio enumeration with rounding (generate_anchor.py:63-74)
    size = w * h
    size_ratios = size / ratios
    ws_r = np.round(np.sqrt(size_ratios))
    hs_r = np.round(ws_r * ratios)

    anchors = []
    for wr, hr in zip(ws_r, hs_r):
        # scale enumeration (generate_anchor.py:77-86)
        ws = wr * scales
        hs = hr * scales
        anchors.append(np.stack([
            x_ctr - 0.5 * (ws - 1),
            y_ctr - 0.5 * (hs - 1),
            x_ctr + 0.5 * (ws - 1),
            y_ctr + 0.5 * (hs - 1),
        ], axis=1))
    return np.concatenate(anchors, axis=0)


def shift_anchors(base_anchors, feat_height: int, feat_width: int,
                  feat_stride: int) -> jnp.ndarray:
    """Full anchor grid [H*W*A, 4], ordered (h, w, a) slowest-to-fastest.

    Matches the reference grid layout (operator_py/proposal.py:92-106 and
    lib/rpn/rpn.py:130-141), which itself matches the (1, H, W, 4*A) transpose of the
    RPN conv output.
    """
    base = jnp.asarray(base_anchors, dtype=jnp.float32)        # [A, 4]
    shift_x = jnp.arange(feat_width, dtype=jnp.float32) * feat_stride
    shift_y = jnp.arange(feat_height, dtype=jnp.float32) * feat_stride
    sx, sy = jnp.meshgrid(shift_x, shift_y)                    # [H, W]
    shifts = jnp.stack([sx, sy, sx, sy], axis=-1)              # [H, W, 4]
    all_anchors = shifts[:, :, None, :] + base[None, None, :, :]  # [H, W, A, 4]
    return all_anchors.reshape(-1, 4)
