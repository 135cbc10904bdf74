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
    """The fused op's backward is its own Pallas kernel (residual-free trig
    recompute). Compare (d_pos, d_W, d_b) against the exact-trig reference with
    the cotangent restricted to activations comfortably above the 1e-6 log
    clamp: d_acc = g / acc, so near the clamp 1/acc amplifies the kernel's
    ~2e-7 polynomial-trig error unboundedly — an ill-conditioning of the
    reference formula itself (the MXNet original backprops the same 1/w_g),
    not an implementation difference."""
    C, N, G = 3, 8, 4
    pos = jnp.asarray((rng.randn(C, 4, N, N)).astype(np.float32))
    W = jnp.asarray((rng.randn(64, G) * 0.1).astype(np.float32))
    b = jnp.asarray((rng.randn(G) * 0.05).astype(np.float32))

    # acc with exact trig, to locate the well-conditioned region
    from relation_tpu.ops.pallas.geom_bias import _frequencies
    freqs = jnp.asarray(_frequencies())
    div = pos[:, :, None, :, :] * 100.0 * freqs[None, None, :, None, None]
    emb = jnp.concatenate([jnp.sin(div), jnp.cos(div)], axis=2).reshape(C, 64, N, N)
    acc = jnp.einsum("cfnm,fg->cgnm", emb, W) + b[None, :, None, None]
    ct = jnp.asarray(rng.randn(C, G, N, N).astype(np.float32)
                     * (np.asarray(acc) > 0.1))

    def loss(fn):
        return lambda p, w, bb: jnp.sum(fn(p, w, bb) * ct)

    got = jax.grad(loss(fused_geometric_bias), argnums=(0, 1, 2))(pos, W, b)
    want = jax.grad(loss(geom_bias_reference), argnums=(0, 1, 2))(pos, W, b)
    # measured error vs cotangent mask threshold (seed 0): 5e-2 at acc>1e-2,
    # 2.3e-3 at >0.1, 6e-4 floor at >=0.3 — a pure conditioning curve (f32
    # range-reduction noise ~3e-5 rad at |arg|~400 through d_acc = g/acc)
    for name, a, e in zip(("d_pos", "d_W", "d_b"), got, want):
        a, e = np.asarray(a), np.asarray(e)
        scale = max(np.abs(e).max(), 1e-6)
        assert np.abs(a - e).max() / scale < 1e-2, \
            f"{name}: {np.abs(a - e).max() / scale}"

    # fully-clamped region: both sides must return exactly zero for a
    # cotangent confined to acc < 1e-6 activations
    ct0 = jnp.asarray(rng.randn(C, G, N, N).astype(np.float32)
                      * (np.asarray(acc) < -1e-3))
    def loss0(fn):
        return lambda w: jnp.sum(fn(pos, w, b) * ct0)
    gz = np.asarray(jax.grad(loss0(fused_geometric_bias))(W))
    assert np.abs(gz).max() == 0.0


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


def _nms_oracle(boxes, scores, thresh, valid):
    """Host greedy NMS, reference semantics (lib/nms/nms.py:45-83)."""
    order = np.argsort(-np.where(valid, scores, -1e10), kind="stable")
    keep = np.zeros(len(boxes), bool)
    areas = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    for i in order:
        if not valid[i]:
            continue
        ok = True
        for j in np.where(keep)[0]:
            ix1 = max(boxes[i, 0], boxes[j, 0]); iy1 = max(boxes[i, 1], boxes[j, 1])
            ix2 = min(boxes[i, 2], boxes[j, 2]); iy2 = min(boxes[i, 3], boxes[j, 3])
            iw = max(ix2 - ix1 + 1, 0); ih = max(iy2 - iy1 + 1, 0)
            iou = iw * ih / (areas[i] + areas[j] - iw * ih)
            if iou > thresh:
                ok = False
                break
        keep[i] = ok
    return keep


def test_pallas_nms_kernel_matches_oracle(rng):
    """nms_keep_sorted (interpret mode) == host greedy NMS, incl. valid masking
    and batching over classes."""
    from relation_tpu.ops.pallas.nms_kernel import nms_keep_sorted

    C, n, T = 3, 128, 128
    centers = rng.uniform(40, 400, (12, 2))
    keeps, boxesT, valids, orders = [], [], [], []
    for c in range(C):
        pick = rng.randint(0, 12, n)
        cxy = centers[pick] + rng.uniform(-12, 12, (n, 2))
        wh = rng.uniform(15, 70, (n, 2))
        boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], 1).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        valid = rng.uniform(0, 1, n) > 0.1
        keeps.append(_nms_oracle(boxes, scores, 0.5, valid))
        order = np.argsort(-np.where(valid, scores, -1e10), kind="stable")
        boxesT.append(boxes[order].T)
        valids.append(valid[order].astype(np.float32))
        orders.append(order)
    keep_f = np.asarray(nms_keep_sorted(
        jnp.asarray(np.stack(boxesT)), jnp.asarray(np.stack(valids)),
        thresh=0.5, block=T, interpret=True))
    for c in range(C):
        got = np.zeros(n, bool)
        got[orders[c]] = keep_f[c] > 0.5
        np.testing.assert_array_equal(got, keeps[c])


def test_pallas_nms_kernel_max_keep(rng):
    """Early exit keeps the top-max_keep kept set exact."""
    from relation_tpu.ops.pallas.nms_kernel import nms_keep_sorted

    n, T = 256, 128
    centers = rng.uniform(50, 450, (25, 2))
    pick = rng.randint(0, 25, n)
    cxy = centers[pick] + rng.uniform(-15, 15, (n, 2))
    wh = rng.uniform(20, 80, (n, 2))
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], 1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    order = np.argsort(-scores, kind="stable")
    bT = jnp.asarray(boxes[order].T[None])
    vf = jnp.ones((1, n), jnp.float32)
    full = np.asarray(nms_keep_sorted(bT, vf, thresh=0.5, block=T,
                                      interpret=True))[0] > 0.5
    early = np.asarray(nms_keep_sorted(bT, vf, thresh=0.5, block=T, max_keep=8,
                                       interpret=True))[0] > 0.5
    kept_full = np.where(full)[0][:8]
    kept_early = np.where(early)[0][:8]
    np.testing.assert_array_equal(kept_full, kept_early)


def test_fused_bias_attention_matches_reference(rng):
    from relation_tpu.ops.pallas.nms_attention import (
        fused_bias_attention, bias_attention_reference)

    C, N, G, dqk, F, E = 3, 24, 4, 8, 16, 4
    bias = jnp.asarray(rng.randn(C, G, N, N).astype(np.float32))
    q = jnp.asarray(rng.randn(C, N, G * dqk).astype(np.float32) * 0.2)
    k = jnp.asarray(rng.randn(C, N, G * dqk).astype(np.float32) * 0.2)
    v = jnp.asarray(rng.randn(C, N, F).astype(np.float32) * 0.5)
    wl = jnp.asarray(rng.randn(G, F, E).astype(np.float32) * 0.1)
    got = np.asarray(fused_bias_attention(bias, q, k, v, wl))
    ref = np.asarray(bias_attention_reference(bias, q, k, v, wl))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_fused_bias_attention_gradients(rng):
    from relation_tpu.ops.pallas.nms_attention import (
        fused_bias_attention, bias_attention_reference)

    C, N, G, dqk, F, E = 2, 8, 2, 4, 8, 4
    args = (jnp.asarray(rng.randn(C, G, N, N).astype(np.float32) * 0.3),
            jnp.asarray(rng.randn(C, N, G * dqk).astype(np.float32) * 0.2),
            jnp.asarray(rng.randn(C, N, G * dqk).astype(np.float32) * 0.2),
            jnp.asarray(rng.randn(C, N, F).astype(np.float32) * 0.5),
            jnp.asarray(rng.randn(G, F, E).astype(np.float32) * 0.1))
    g1 = jax.grad(lambda *a: jnp.sum(jnp.tanh(fused_bias_attention(*a))),
                  argnums=(0, 1, 2, 3, 4))(*args)
    g2 = jax.grad(lambda *a: jnp.sum(jnp.tanh(bias_attention_reference(*a))),
                  argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_stem_kernel_matches_xla(rng):
    """Fused Pallas stem (interpret) == plain conv1+bn+relu on the s2d input."""
    from relation_tpu.ops.pallas.stem import stem_conv1_bn_relu
    from relation_tpu.models.backbone import conv1_w4, image_to_s2d_planar

    H, W = 32, 64
    img = rng.randn(H, W, 3).astype(np.float32) * 10
    w7 = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * 0.05)
    scale = jnp.asarray(rng.uniform(0.5, 2, 64).astype(np.float32))
    bias = jnp.asarray(rng.randn(64).astype(np.float32))

    ref = jax.lax.conv_general_dilated(
        jnp.asarray(img[None]), w7, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)[0]
    ref = np.maximum(np.asarray(ref) * np.asarray(scale) + np.asarray(bias), 0)

    s2d = jnp.asarray(image_to_s2d_planar(img))
    got = np.asarray(stem_conv1_bn_relu(s2d, conv1_w4(w7), scale, bias,
                                        interpret=True), np.float32)
    got = got.transpose(1, 2, 0)                    # planar -> HWC
    # kernel computes the matmul in bf16 -> compare at bf16 tolerance
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.5)
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.9999


def test_res4_stack_kernel_matches_reference(rng):
    """VMEM-resident bottleneck stack (interpret) == jnp reference chain."""
    from relation_tpu.ops.pallas.res4 import (
        _fused_bottleneck_stack_impl, bottleneck_stack_reference)

    H, W, C, Cmid, B = 8, 16, 128, 32, 3
    x = jnp.asarray(rng.randn(H, W, C), jnp.bfloat16)
    wa = jnp.asarray(rng.randn(B, C, Cmid) * 0.1, jnp.bfloat16)
    b1 = jnp.asarray(rng.randn(B, Cmid) * 0.1, jnp.float32)
    w3 = jnp.asarray(rng.randn(B, 9 * Cmid, Cmid) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(rng.randn(B, Cmid) * 0.1, jnp.float32)
    wc = jnp.asarray(rng.randn(B, Cmid, C) * 0.1, jnp.bfloat16)
    b3 = jnp.asarray(rng.randn(B, C) * 0.1, jnp.float32)

    got = np.asarray(_fused_bottleneck_stack_impl(
        x, wa, b1, w3, b2, wc, b3, True), np.float32)
    ref = np.asarray(bottleneck_stack_reference(
        x, wa, b1, w3, b2, wc, b3), np.float32)
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)


def test_res4_fused_backbone_path_matches_plain(rng):
    """ResNet101C4 with the fused res4 stack == the plain Bottleneck chain,
    sharing one param tree (fold correctness incl. BN folding and tap order)."""
    from relation_tpu.models.backbone import ResNet101C4

    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    plain = ResNet101C4(fuse_res4=False)
    params = plain.init(jax.random.PRNGKey(0), x)
    # randomize BN stats so the fold is non-trivial
    def jitter(p, path=()):
        if isinstance(p, dict):
            return {k: jitter(v, path + (k,)) for k, v in p.items()}
        if path and path[-1] in ("moving_var",):
            return p * jnp.asarray(
                rng.uniform(0.5, 2.0, p.shape).astype(np.float32))
        if path and path[-1] in ("moving_mean", "beta"):
            return p + jnp.asarray(
                rng.randn(*p.shape).astype(np.float32) * 0.1)
        return p
    params = jitter(params)
    ref = np.asarray(plain.apply(params, x), np.float32)
    got = np.asarray(ResNet101C4(fuse_res4=True).apply(params, x), np.float32)
    np.testing.assert_allclose(got, ref, rtol=0.1, atol=0.1)
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.999


def test_fold_res4_params_matches_in_graph_fold(rng):
    """Precomputed fold (backbone.fold_res4_params, run outside the jit) drives
    the kernel to the same output as the plain Bottleneck chain."""
    from relation_tpu.models.backbone import ResNet101C4, fold_res4_params

    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    plain = ResNet101C4(fuse_res4=False)
    params = plain.init(jax.random.PRNGKey(1), x)
    ref = np.asarray(plain.apply(params, x), np.float32)
    folded = fold_res4_params(params["params"])
    got = np.asarray(ResNet101C4().apply(params, x, folded), np.float32)
    np.testing.assert_allclose(got, ref, rtol=0.1, atol=0.1)
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.999


def test_proj_bottleneck_kernel_matches_reference(rng):
    """Projection-block kernel (interpret) == jnp reference, stride 1 and 2."""
    from relation_tpu.ops.pallas.bottleneck_proj import (
        fused_proj_bottleneck, proj_bottleneck_reference)

    for stride, (H, W, Cin, Cmid, Cout) in [(1, (8, 16, 16, 8, 32)),
                                            (2, (8, 16, 32, 8, 64))]:
        args = (jnp.asarray(rng.randn(H, W, Cin), jnp.bfloat16),
                jnp.asarray(rng.randn(Cin, Cout) * 0.1, jnp.bfloat16),
                jnp.asarray(rng.randn(Cout) * 0.1, jnp.float32),
                jnp.asarray(rng.randn(Cin, Cmid) * 0.1, jnp.bfloat16),
                jnp.asarray(rng.randn(Cmid) * 0.1, jnp.float32),
                jnp.asarray(rng.randn(9 * Cmid, Cmid) * 0.05, jnp.bfloat16),
                jnp.asarray(rng.randn(Cmid) * 0.1, jnp.float32),
                jnp.asarray(rng.randn(Cmid, Cout) * 0.1, jnp.bfloat16),
                jnp.asarray(rng.randn(Cout) * 0.1, jnp.float32))
        got = np.asarray(fused_proj_bottleneck(*args, stride=stride,
                                               interpret=True), np.float32)
        ref = np.asarray(proj_bottleneck_reference(*args, stride=stride),
                         np.float32)
        np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)


def test_all_pallas_trunk_matches_plain(rng):
    """fold_trunk_params + proj/stack kernels == the plain Bottleneck chain
    (29 blocks of compounding bf16 rounding -> loose tolerance + correlation)."""
    from relation_tpu.models.backbone import ResNet101C4, fold_trunk_params

    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    plain = ResNet101C4(fuse_res4=False)
    params = plain.init(jax.random.PRNGKey(1), x)
    ref = np.asarray(plain.apply(params, x), np.float32)
    folded = fold_trunk_params(params["params"])
    got = np.asarray(ResNet101C4().apply(params, x, None, folded), np.float32)
    np.testing.assert_allclose(got, ref, rtol=0.2, atol=0.2)
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.999


def test_stem_kernel_gradients_via_reference_vjp(rng):
    """grad through the stem kernel (custom_vjp -> stem_reference backward)
    matches grad of the reference directly — and, critically, survives the
    training-step transform stack jit(vmap(grad)) that crashed the raw kernel
    on TPU (pallas grid context lost during linearize)."""
    from relation_tpu.ops.pallas.stem import stem_conv1_bn_relu, stem_reference

    s2d = jnp.asarray(rng.randn(12, 16, 128).astype(np.float32))
    w4 = jnp.asarray(rng.randn(192, 64).astype(np.float32) * 0.05)
    scale = jnp.asarray(rng.uniform(0.5, 2, 64).astype(np.float32))
    bias = jnp.asarray(rng.randn(64).astype(np.float32))

    def loss_k(w4, scale, bias, s2d):
        return jnp.sum(jnp.abs(stem_conv1_bn_relu(
            s2d, w4, scale, bias, True).astype(jnp.float32)))

    def loss_r(w4, scale, bias, s2d):
        return jnp.sum(jnp.abs(stem_reference(
            s2d, w4, scale, bias).astype(jnp.float32)))

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(w4, scale, bias, s2d)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(w4, scale, bias, s2d)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.05, atol=0.05)

    # the train-step transform stack: jit(vmap over batch of grad)
    batched = jax.jit(jax.vmap(jax.grad(
        lambda img: jnp.sum(jnp.abs(stem_conv1_bn_relu(
            img, w4, scale, bias, True).astype(jnp.float32))))))
    g = batched(jnp.stack([s2d, s2d * 0.5]))
    assert np.asarray(g).shape == (2, 12, 16, 128)
