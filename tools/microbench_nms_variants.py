"""Proposal-NMS variants on REAL-ish RPN outputs (backbone on a random image).

The XLA while_loop formulation's cost is data-dependent (intra-block fixpoint
iterations = suppression chain depth); random synthetic boxes measure ~100 us
but realistic clustered RPN boxes measure ~3-4x that. The Pallas sweep kernel
keeps the fixpoint in VMEM registers, so its degradation is much smaller.
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

from microbench import timeit_us

sys.path.insert(0, "/root/repo")


def main():
    from __graft_entry__ import entry, _flagship_cfg
    from relation_tpu.core.trainer import build_model
    from relation_tpu.models.detector import RelationRCNN
    from relation_tpu.models.rpn import generate_proposals
    from relation_tpu.ops.anchors import generate_anchors
    from relation_tpu.ops.nms import greedy_nms_mask
    from relation_tpu.ops.pallas.nms_kernel import nms_keep_sorted

    cfg = _flagship_cfg()
    model = build_model(cfg)
    fn, (params, image, im_info) = entry()
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.randn(*image.shape).astype(np.float32) * 40.0)
    stride = int(cfg.network.RPN_FEAT_STRIDE)
    base_anchors = generate_anchors(stride, tuple(cfg.network.ANCHOR_RATIOS),
                                    tuple(cfg.network.ANCHOR_SCALES))
    pre_n = int(cfg.TEST.RPN_PRE_NMS_TOP_N)
    post_n = int(cfg.TEST.RPN_POST_NMS_TOP_N)
    thresh = float(cfg.TEST.RPN_NMS_THRESH)

    feat, rpn_cls, rpn_bbox = jax.jit(lambda im: model.apply(
        {"params": params}, im, method=RelationRCNN.features_and_rpn))(image)

    def proposals_current(rpn_cls):
        fg = jax.nn.softmax(rpn_cls, axis=-1)[..., 1]
        rois, s, r = generate_proposals(fg, rpn_bbox, base_anchors, im_info,
                                        stride, pre_n, post_n, thresh,
                                        float(cfg.TEST.RPN_MIN_SIZE))
        return rois
    print(f"current (XLA loop)   {timeit_us(proposals_current, rpn_cls, n=30):8.1f} us")

    # isolate: decode+topk only (shared prefix of both variants)
    def decode_topk(rpn_cls):
        fg = jax.nn.softmax(rpn_cls, axis=-1)[..., 1]
        H, W, A = fg.shape
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
        y1 = jnp.clip(pcy - 0.5 * (ph - 1.0), 0, im_info[0] - 1)
        x2 = jnp.clip(pcx + 0.5 * (pw - 1.0), 0, im_info[1] - 1)
        y2 = jnp.clip(pcy + 0.5 * (ph - 1.0), 0, im_info[0] - 1)
        k = pre_n
        top_scores, idx = jax.lax.top_k(scores, k)
        bT = jnp.stack([x1[idx], y1[idx], x2[idx], y2[idx]], axis=0)  # [4, k]
        return bT, top_scores

    def prefix_only(rpn_cls):
        bT, s = decode_topk(rpn_cls)
        return bT.sum() + s.sum()
    print(f"decode+topk prefix   {timeit_us(prefix_only, rpn_cls, n=30):8.1f} us")

    bT, top_scores = jax.jit(decode_topk)(rpn_cls)

    # variant A tail: current greedy_nms_mask on [k, 4]
    def tail_xla(top_scores):
        boxes = bT.T
        keep = greedy_nms_mask(boxes, top_scores, thresh,
                               valid=top_scores > -1e9, max_keep=post_n)
        masked = jnp.where(keep, top_scores, -1e10)
        order = jnp.argsort(-masked)
        return order[:post_n]
    print(f"tail XLA loop        {timeit_us(tail_xla, top_scores, n=30):8.1f} us")

    # variant B tail: pallas sweep on the already-sorted boxes
    def tail_pallas(top_scores):
        k = bT.shape[1]
        T = 256
        kp = -(-k // T) * T
        bTp = jnp.zeros((1, 4, kp), jnp.float32).at[0, :, :k].set(bT)
        vp = jnp.zeros((1, kp), jnp.float32).at[0, :k].set(
            (top_scores > -1e9).astype(jnp.float32))
        keep = nms_keep_sorted(bTp, vp, thresh=thresh, block=T,
                               max_keep=post_n)[0, :k]
        masked = jnp.where(keep > 0.5, top_scores, -1e10)
        order = jnp.argsort(-masked)
        return order[:post_n]
    print(f"tail pallas sweep    {timeit_us(tail_pallas, top_scores, n=30):8.1f} us")

    # parity of the two tails on this data
    a = np.asarray(jax.jit(tail_xla)(top_scores))
    b = np.asarray(jax.jit(tail_pallas)(top_scores))
    print("tails agree:", bool((a == b).all()))


if __name__ == "__main__":
    main()
