"""Config layer: schema parity with the reference, recursive YAML validation.

Reference: relation_rcnn/config/config.py:18-198. Note the reference's
update_config only validates TOP-LEVEL keys (config.py:180-196: nested dict
entries are assigned unchecked); we validate every level, which is strictly
safer and still loads all 10 reference YAMLs unmodified.
"""

import glob
import os

import numpy as np
import pytest
import yaml

from relation_tpu.config.defaults import default_config, load_config

REF_CFG_DIR = "/root/reference/experiments/relation_rcnn/cfgs"


@pytest.mark.parametrize("path", sorted(
    glob.glob(os.path.join(REF_CFG_DIR, "*.yaml"))
    if os.path.isdir(REF_CFG_DIR) else []))
def test_reference_yaml_loads_unmodified(path):
    cfg = load_config(path)
    raw = yaml.safe_load(open(path))
    # overlay values actually land (spot-check a few reference-set leaves)
    assert cfg.symbol == raw["symbol"]
    assert cfg.dataset.NUM_CLASSES == raw["dataset"]["NUM_CLASSES"]
    assert cfg.TRAIN.end_epoch == raw["TRAIN"]["end_epoch"]
    if "PIXEL_MEANS" in raw.get("network", {}):
        np.testing.assert_array_equal(cfg.network.PIXEL_MEANS,
                                      raw["network"]["PIXEL_MEANS"])
    if "SCALES" in raw:
        assert cfg.SCALES[0] == tuple(raw["SCALES"][0] if
                                      isinstance(raw["SCALES"][0], list)
                                      else raw["SCALES"])


def _write(tmp_path, doc):
    f = str(tmp_path / "c.yaml")
    with open(f, "w") as fh:
        yaml.dump(doc, fh)
    return f


def test_unknown_top_level_key_rejected(tmp_path):
    with pytest.raises(ValueError, match="must exist"):
        load_config(_write(tmp_path, {"SYMBOl": "x"}))


def test_unknown_nested_key_rejected(tmp_path):
    # the round-1 gap: a typo'd nested key was silently accepted
    with pytest.raises(ValueError, match="TRAIN.LEARN_NMs"):
        load_config(_write(tmp_path, {"TRAIN": {"LEARN_NMs": True}}))
    with pytest.raises(ValueError, match="TEST.SOFT_NMS"):
        load_config(_write(tmp_path, {"TEST": {"SOFT_NMS": True}}))


def test_nested_overlay_and_array_coercion(tmp_path):
    f = _write(tmp_path, {
        "SCALES": [800, 1333],
        "TRAIN": {"BBOX_WEIGHTS": [2.0, 2.0, 1.0, 1.0],
                  "ALTERNATE": {"RPN_BATCH_IMAGES": 4}},
        "network": {"PIXEL_MEANS": [103.06, 115.90, 123.15]},
    })
    cfg = load_config(f)
    assert cfg.SCALES[0] == (800, 1333)
    assert isinstance(cfg.TRAIN.BBOX_WEIGHTS, np.ndarray)
    np.testing.assert_array_equal(cfg.TRAIN.BBOX_WEIGHTS, [2, 2, 1, 1])
    assert isinstance(cfg.network.PIXEL_MEANS, np.ndarray)
    assert cfg.TRAIN.ALTERNATE.RPN_BATCH_IMAGES == 4
    # untouched siblings keep defaults
    assert cfg.TRAIN.momentum == 0.9


def test_tpu_defaults_parity_safe():
    cfg = default_config()
    # parity-first numerics: head matmuls default f32 (bf16 is opt-in)
    assert cfg.TPU.HEAD_DTYPE == "float32"
    assert cfg.TEST.SCORE_THRESH == pytest.approx(1e-3)


def test_r5_tpu_knob_wiring():
    """Round-5 TPU knobs must reach the model fields through build_model
    (a typo'd/miswired knob silently runs the slow path)."""
    import jax.numpy as jnp
    from relation_tpu.config.defaults import default_config
    from relation_tpu.core.trainer import build_model

    def cfg_for(symbol):
        cfg = default_config()
        cfg.symbol = symbol
        cfg.network.NUM_ANCHORS = 6
        cfg.network.ANCHOR_SCALES = (2, 4)
        return cfg

    fpn_sym = ("resnet_v1_101_rcnn_fpn_attention_1024_pairwise_position_"
               "multi_head_16_learn_nms")
    dcn_sym = ("resnet_v1_101_rcnn_dcn_attention_1024_pairwise_position_"
               "multi_head_16_learn_nms")
    c4_sym = ("resnet_v1_101_rcnn_attention_1024_pairwise_position_"
              "multi_head_16_learn_nms")

    # FPN_ALLOW_PALLAS: False | "lnms" | True
    m = build_model(cfg_for(fpn_sym))
    assert m.allow_pallas is False and m.allow_pallas_lnms is False
    cfg = cfg_for(fpn_sym)
    cfg.TPU.FPN_ALLOW_PALLAS = "lnms"
    m = build_model(cfg)
    assert m.allow_pallas is False and m.allow_pallas_lnms is True
    cfg.TPU.FPN_ALLOW_PALLAS = True
    m = build_model(cfg)
    assert m.allow_pallas is True and m.allow_pallas_lnms is True

    # DCN_POOL_DTYPE: bf16 default on the real trunk, f32 for tiny + parity
    m = build_model(cfg_for(dcn_sym))
    assert m.dcn_pool_dtype == jnp.bfloat16
    cfg = cfg_for(dcn_sym)
    cfg.TPU.DCN_POOL_DTYPE = "float32"
    assert build_model(cfg).dcn_pool_dtype == jnp.float32
    assert build_model(cfg_for(dcn_sym), tiny=True).dcn_pool_dtype == jnp.float32

    # LNMS_ATTN: pallas default, xla flips the head off the kernels
    assert build_model(cfg_for(c4_sym)).lnms_allow_pallas is True
    cfg = cfg_for(c4_sym)
    cfg.TPU.LNMS_ATTN = "xla"
    assert build_model(cfg).lnms_allow_pallas is False

    # COMPUTE_DTYPE: f32 trunk mode (the multichip certificates)
    assert build_model(cfg_for(c4_sym)).conv_dtype == jnp.bfloat16
    cfg = cfg_for(c4_sym)
    cfg.TPU.COMPUTE_DTYPE = "float32"
    assert build_model(cfg).conv_dtype == jnp.float32
