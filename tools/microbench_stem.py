"""Micro-benchmark conv1 stem variants on the real TPU chip.

The full stem = conv1 7x7/2 + relu + 3x3/2 maxpool: 608x1024x3 -> 152x256x64.

Key finding (tools/microbench.py): an NHWC [H, W, 3] image is lane-padded
3->128 on TPU (~42x HBM waste), so *touching* it costs ~1 ms — this, not the
conv algorithm, is the stem pathology. Variants here avoid [.., 3] and [.., 2]
trailing dims entirely:

- input as s2d planar [12, H/2, W/2] (host does space-to-depth; MLPerf-style)
- or planar [3, H, W] with device-side s2d via 4 strided slices
- conv1 as explicit 16-tap im2col + one [192 x 64] MXU matmul
"""
import numpy as np
import jax
import jax.numpy as jnp

from microbench import timeit_us

BF = jnp.bfloat16


def w7_to_w4(w7):
    """[7,7,3,64] -> [16*12, 64]: tap (di, dj) x phase (pi, pj) x c, with
    original tap i = 2*di + pi - 1 (i = -1 is zero pad). Flatten order of the
    12 = (pi, pj, c), matching s2d channel order p*6 + q*3 + c."""
    C = w7.shape[2]
    w8 = jnp.pad(w7, ((1, 0), (1, 0), (0, 0), (0, 0)))
    return (w8.reshape(4, 2, 4, 2, C, 64)
            .transpose(0, 2, 1, 3, 4, 5)         # (di, dj, pi, pj, c, o)
            .reshape(16 * 4 * C, 64))


def s2d_planar_host(img_hwc):
    """Host-side (numpy) space-to-depth: [H, W, 3] -> [12, H/2, W/2] with
    channel order (pi, pj, c)."""
    H, W, C = img_hwc.shape
    return (img_hwc.reshape(H // 2, 2, W // 2, 2, C)
            .transpose(1, 3, 4, 0, 2)
            .reshape(4 * C, H // 2, W // 2))


def conv1_from_s2d(s2d, w4):
    """s2d: [12, Ho, Wo] -> conv1 out [64, Ho, Wo] planar. 16 contiguous tap
    slices + one MXU matmul."""
    K, Ho, Wo = s2d.shape
    sp = jnp.pad(s2d.astype(BF), ((0, 0), (2, 1), (2, 1)))
    taps = jnp.stack([sp[:, dh:dh + Ho, dw:dw + Wo]
                      for dh in range(4) for dw in range(4)])
    patches = taps.reshape(16 * K, Ho * Wo)
    out = jnp.dot(w4.astype(BF).T, patches, preferred_element_type=BF)
    return out.reshape(64, Ho, Wo)


def stem_from_s2d(s2d, w4):
    y = jnp.maximum(conv1_from_s2d(s2d, w4), 0)[None]
    y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 1, 3, 3),
                              (1, 1, 2, 2), ((0, 0), (0, 0), (1, 1), (1, 1)))
    return y.transpose(0, 2, 3, 1)               # NHWC [1, 152, 256, 64]


def stem_from_planar(x_pl, w4):
    """x_pl: [1, 3, H, W]; device-side s2d via 4 strided slices."""
    _, C, H, W = x_pl.shape
    x = x_pl[0].astype(BF)
    s2d = jnp.concatenate([x[:, p::2, q::2]
                           for p in range(2) for q in range(2)])  # (p,q,c) major->minor? no: order (p*2+q) blocks of C
    # reorder blocks (p*2+q, c) -> flat (p, q, c): concatenate already gives
    # [(p0q0)c0..2, (p0q1)c0..2, ...] = p*6 + q*3 + c. Correct.
    return stem_from_s2d(s2d, w4)


def stem_nhwc_pad8(x_nhwc, w7):
    """Current production stem: NHWC image, channels padded 3->8."""
    xp = jnp.pad(x_nhwc.astype(BF), ((0, 0), (0, 0), (0, 0), (0, 5)))
    w7p = jnp.pad(w7, ((0, 0), (0, 0), (0, 5), (0, 0))).astype(BF)
    y = jax.lax.conv_general_dilated(
        xp, w7p, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=BF)
    y = jnp.maximum(y, 0)
    return jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                 (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))


def main():
    rng = np.random.RandomState(0)
    img = rng.randn(608, 1024, 3).astype(np.float32) * 40
    x_nhwc = jnp.asarray(img[None])
    x_pl = jnp.asarray(img.transpose(2, 0, 1)[None])
    x_s2d = jnp.asarray(s2d_planar_host(img))
    w7 = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * 0.05)
    w4 = w7_to_w4(w7)

    a = np.asarray(jax.jit(stem_nhwc_pad8)(x_nhwc, w7), np.float32)
    scale = np.abs(a).mean()
    for name, f, x in [("s2d_input", stem_from_s2d, x_s2d),
                       ("planar_input", stem_from_planar, x_pl)]:
        b = np.asarray(jax.jit(f)(x, w4), np.float32)
        print(f"{name:16s} rel err = {np.abs(a-b).max()/scale:.4f}")

    print(f"{'nhwc_pad8':16s} {timeit_us(stem_nhwc_pad8, x_nhwc, w7):8.1f} us")
    for name, f, x in [("s2d_input", stem_from_s2d, x_s2d),
                       ("planar_input", stem_from_planar, x_pl)]:
        print(f"{name:16s} {timeit_us(f, x, w4):8.1f} us")


if __name__ == "__main__":
    main()
