"""Sub-op timing of the proposal stage (decode / top_k / NMS / gathers) on TPU.

The flagship 608x1024 bucket has a 38x64 stride-16 grid and 12 anchors:
N = 12*38*64 = 29184 candidate scores... actually the RPN map at 608x1024 is
38x64 -> N = 29184. PRE_NMS_TOP_N = 6000. This isolates where the measured
~0.55 ms proposal stage goes.
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

from microbench import timeit_us

sys.path.insert(0, "/root/repo")


def main():
    from __graft_entry__ import _flagship_cfg
    from relation_tpu.ops.anchors import generate_anchors
    from relation_tpu.models.rpn import generate_proposals
    from relation_tpu.ops.nms import greedy_nms_topk

    cfg = _flagship_cfg()
    stride = int(cfg.network.RPN_FEAT_STRIDE)
    A = int(cfg.network.NUM_ANCHORS)
    H, W = 608 // stride, 1024 // stride
    base_anchors = generate_anchors(stride, tuple(cfg.network.ANCHOR_RATIOS),
                                    tuple(cfg.network.ANCHOR_SCALES))
    pre_n = int(cfg.TEST.RPN_PRE_NMS_TOP_N)
    post_n = int(cfg.TEST.RPN_POST_NMS_TOP_N)
    print(f"grid {H}x{W}x{A} = {H*W*A} candidates, pre={pre_n}, post={post_n}")

    rng = np.random.RandomState(0)
    rpn_cls = jnp.asarray(rng.randn(H, W, A, 2).astype(np.float32))
    rpn_bbox = jnp.asarray(rng.randn(H, W, A, 4).astype(np.float32) * 0.3)
    im_info = jnp.asarray([600.0, 1000.0, 1.6])

    def full(rpn_cls):
        fg = jax.nn.softmax(rpn_cls, axis=-1)[..., 1]
        rois, s, r = generate_proposals(fg, rpn_bbox, base_anchors, im_info,
                                        stride, pre_n, post_n,
                                        float(cfg.TEST.RPN_NMS_THRESH),
                                        float(cfg.TEST.RPN_MIN_SIZE))
        return rois
    print(f"full proposals    {timeit_us(full, rpn_cls, n=50):8.1f} us")

    N = H * W * A
    scores_flat = jnp.asarray(rng.rand(N).astype(np.float32))

    def topk_only(scores):
        s, i = jax.lax.top_k(scores, min(pre_n, N))
        return s + i.astype(jnp.float32)
    print(f"top_k({N},{pre_n}) {timeit_us(topk_only, scores_flat, n=50):8.1f} us")

    k = min(pre_n, N)
    boxes_k = jnp.asarray(np.abs(rng.randn(k, 4)).astype(np.float32) * 100)
    boxes_k = jnp.concatenate([boxes_k[:, :2],
                               boxes_k[:, :2] + boxes_k[:, 2:] + 1], axis=1)
    scores_k = jnp.asarray(rng.rand(k).astype(np.float32))

    def nms_only(scores_k):
        idx, real = greedy_nms_topk(boxes_k, scores_k,
                                    float(cfg.TEST.RPN_NMS_THRESH), post_n)
        return idx.astype(jnp.float32)
    print(f"nms({k}->{post_n})  {timeit_us(nms_only, scores_k, n=50):8.1f} us")

    # decode-only (everything before top_k)
    def decode_only(rpn_cls):
        fg = jax.nn.softmax(rpn_cls, axis=-1)[..., 1]
        scores = fg.transpose(2, 0, 1).reshape(-1)
        d = rpn_bbox.transpose(2, 3, 0, 1)
        dx, dy, dw, dh = (d[:, i].reshape(-1) for i in range(4))
        sx = jnp.arange(W, dtype=jnp.float32)[None, None, :] * stride
        sy = jnp.arange(H, dtype=jnp.float32)[None, :, None] * stride
        zero = jnp.zeros((A, H, W), jnp.float32)
        ax1 = (base_anchors[:, 0][:, None, None] + sx + zero).reshape(-1)
        ay1 = (base_anchors[:, 1][:, None, None] + sy + zero).reshape(-1)
        ax2 = (base_anchors[:, 2][:, None, None] + sx + zero).reshape(-1)
        ay2 = (base_anchors[:, 3][:, None, None] + sy + zero).reshape(-1)
        aw = ax2 - ax1 + 1.0
        ah = ay2 - ay1 + 1.0
        pcx = dx * aw + ax1 + 0.5 * (aw - 1.0)
        pcy = dy * ah + ay1 + 0.5 * (ah - 1.0)
        pw = jnp.exp(dw) * aw
        ph = jnp.exp(dh) * ah
        x1 = jnp.clip(pcx - 0.5 * (pw - 1.0), 0, im_info[1] - 1)
        return x1 + scores
    print(f"decode only       {timeit_us(decode_only, rpn_cls, n=50):8.1f} us")


if __name__ == "__main__":
    main()
