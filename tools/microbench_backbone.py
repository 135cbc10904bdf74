"""Backbone stage split on TPU: stem..res4 / res5(dilated)+reduce / RPN head.

Identifies whether the ~1.7 ms backbone is bound by the big res4 stack's 1x1-conv
activation traffic or the dilated res5. FLOP shares at 608x1024 (38x64 grid):
res2+3 ~25G, res4 ~78G, res5 ~35G (dilated, stride 1).
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from microbench import timeit_us

sys.path.insert(0, "/root/repo")


def main():
    from __graft_entry__ import entry, _flagship_cfg
    from relation_tpu.models.backbone import ResNet101C4, ResNet101C5

    fn, (params, image, im_info) = entry()
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.randn(*image.shape).astype(np.float32) * 40.0)

    c4_mod = ResNet101C4(dtype=jnp.bfloat16)
    c5_mod = ResNet101C5(dtype=jnp.bfloat16)
    conv_new = nn.Conv(256, (1, 1), dtype=jnp.bfloat16,
                       param_dtype=jnp.float32, name="conv_new_1")
    from relation_tpu.models.rpn import RPNHead
    rpn_mod = RPNHead(num_anchors=12, dtype=jnp.bfloat16)

    def run_c4(im):
        return c4_mod.apply({"params": params["c4"]}, im[None])

    t4 = timeit_us(run_c4, image, n=30)
    print(f"c4 (stem..res4)     {t4:8.1f} us")

    feat4 = jax.jit(run_c4)(image)

    def run_c5_reduce(feat4):
        c5 = c5_mod.apply({"params": params["c5"]}, feat4)
        return nn.relu(conv_new.apply({"params": params["conv_new_1"]}, c5))

    t5 = timeit_us(run_c5_reduce, feat4, n=30)
    print(f"c5 (dilated)+reduce {t5:8.1f} us")

    def run_rpn(feat4):
        return rpn_mod.apply({"params": params["rpn"]}, feat4)[0]

    tr = timeit_us(run_rpn, feat4, n=30)
    print(f"rpn head            {tr:8.1f} us")


if __name__ == "__main__":
    main()
