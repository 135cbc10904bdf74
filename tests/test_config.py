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
