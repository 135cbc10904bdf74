"""Microbench: res4b identity-bottleneck stack — XLA conv chain vs the fused
VMEM-resident Pallas kernel (ops/pallas/res4.py).

Flagship shape: [38, 64, 1024] bf16, Cmid=256, 22 blocks
(reference res4b1..res4b22, resnet_v1_101_rcnn_base.py:29-619).
Roofline: ~119 GFLOP -> ~605 us at v5e peak (197 TFLOP/s bf16);
XLA HBM traffic ~460 MB -> ~560 us at 820 GB/s; kernel traffic ~58 MB.

MEASUREMENT TRAP (hard-won): the XLA chain below times ~1.2 ms standalone but
only ~726 us inside the production backbone (full-c4 1334 us minus truncated
stem..res4a 608 us) — in context XLA picks T(2,128)-style conv layouts for the
whole chain and avoids the per-call relayouts this standalone harness pays.
Judge any res4 change by the in-context A/B (full c4 with/without), not by
this standalone number.

POST-MORTEM (why TPU.FUSE_RES4 defaults off): in the full c4 program the
kernel's presence adds ~+1.0 ms on top of its own runtime — XLA stops fusing
its space-to-batch wrappers around every upstream res2/res3 conv (28 copies,
~423 MB: verified by HLO copy inventory; a NO-OP pallas call at the same
position reproduces the slowdown). res4a+kernel jitted alone costs only
+140 us over the parts. Net: 644 us kernel vs 726 us XLA minus 1 ms
collateral = a loss. Revisit if XLA learns to re-fuse wrapper copies around
custom calls.
"""
import numpy as np
import jax
import jax.numpy as jnp

from microbench import timeit_us
from relation_tpu.ops.pallas.res4 import (
    fused_bottleneck_stack, fused_bottleneck_stack_vmem_bytes)

H, W, C, Cmid, B = 38, 64, 1024, 256, 22
bf = jnp.bfloat16
rng = np.random.RandomState(0)


def mk(*shape, s=0.05):
    return jnp.asarray(rng.randn(*shape).astype(np.float32) * s)


x = mk(H, W, C, s=1.0).astype(bf)
wa = mk(B, C, Cmid).astype(bf)
b1 = mk(B, Cmid)
w3 = mk(B, 9 * Cmid, Cmid).astype(bf)
b2 = mk(B, Cmid)
wc = mk(B, Cmid, C).astype(bf)
b3 = mk(B, C)

# XLA baseline: same math as the production Bottleneck path (folded BN =
# per-channel bias after conv), conv formulation NHWC bf16.
w3c = w3.reshape(B, 3, 3, Cmid, Cmid)  # tap-major rows -> HWIO


def xla_stack(x, wa, b1, w3c, b2, wc, b3):
    y = x[None]
    for i in range(B):
        a = jax.lax.conv_general_dilated(
            y, wa[i][None, None], (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=bf)
        a = jnp.maximum(a + b1[i].astype(bf), 0)
        h = jax.lax.conv_general_dilated(
            a, w3c[i], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=bf)
        h = jnp.maximum(h + b2[i].astype(bf), 0)
        o = jax.lax.conv_general_dilated(
            h, wc[i][None, None], (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=bf)
        y = jnp.maximum(y + o + b3[i].astype(bf), 0)
    return y[0]


print("VMEM working set: %.1f MB" %
      (fused_bottleneck_stack_vmem_bytes(H, W, C, Cmid) / 2**20))
t_xla = timeit_us(xla_stack, x, wa, b1, w3c, b2, wc, b3, n=30, k=4)
print("XLA conv stack    %9.1f us" % t_xla)
t_pal = timeit_us(fused_bottleneck_stack, x, wa, b1, w3, b2, wc, b3, n=30, k=4)
print("Pallas fused      %9.1f us" % t_pal)

# agreement check on-device
o1 = np.asarray(xla_stack(x, wa, b1, w3c, b2, wc, b3), np.float32)
o2 = np.asarray(fused_bottleneck_stack(x, wa, b1, w3, b2, wc, b3), np.float32)
print("max|diff| %.4f  max|ref| %.1f" % (np.abs(o1 - o2).max(), np.abs(o1).max()))
