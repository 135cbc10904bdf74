"""Experiment-YAML parity with the reference configs.

Every shipped experiments/cfgs/*.yaml must carry the same semantic values as
its reference namesake (/root/reference/experiments/relation_rcnn/cfgs/) —
a reference user switching frameworks gets the training/eval recipe they
expect. Divergences must be one of:
- cosmetic (quoting, float spelling, list-vs-comma-string)
- a key the reference yaml omits where our explicit value equals the
  REFERENCE default (relation_rcnn/config/config.py)
- an entry in ALLOWED (deliberate, documented in the yaml itself)

Round-4 context: this test was added after a semantic deep-compare found real
drift (plain/DCN missing anchor scale 4 -> a 9-anchor RPN vs the reference's
12; FPN SCALES 600 vs 800, OHEM 128 vs 512, missing TOP_ROIS; the learn-NMS
freeze list). See the round-4 commit aligning the yamls.
"""

import glob
import os

import pytest
import yaml

REF_CFG_DIR = "/root/reference/experiments/relation_rcnn/cfgs"
OUR_CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "experiments",
                           "cfgs")

# keys that are host/framework bookkeeping, not experiment semantics
IGNORED = {
    "MXNET_VERSION", "gpus", "output_path",
    "default.kvstore", "default.frequent",
    "network.pretrained",          # path layout differs (msgpack vs .params)
    "dataset.dataset_path", "dataset.root_path",
    "TRAIN.model_prefix",
    "dataset.proposal_cache",      # path layout; resolution tested separately
}

# deliberate value divergences, each documented where it lives
ALLOWED = {
    # Our end2end FPN extension uses true per-level pyramid anchors
    # (scale 8 x 3 ratios/level — assign_pyramid_anchor's own defaults,
    # lib/rpn/rpn.py:247). The reference yaml's 4-scale list is dead config:
    # assign_pyramid_anchor has no callers and the reference FPN consumes
    # externally cached proposals. Commented in the yamls.
    ("resnet_v1_101_coco_trainvalminus_rcnn_fpn_8epoch.yaml",
     "network.ANCHOR_SCALES"),
    ("resnet_v1_101_coco_trainvalminus_rcnn_fpn_8epoch.yaml",
     "network.NUM_ANCHORS"),
    ("resnet_v1_101_coco_trainvalminus_rcnn_fpn_relation_8epoch.yaml",
     "network.ANCHOR_SCALES"),
    ("resnet_v1_101_coco_trainvalminus_rcnn_fpn_relation_8epoch.yaml",
     "network.NUM_ANCHORS"),
    ("resnet_v1_101_coco_trainvalminus_rcnn_fpn_relation_learn_nms_8epoch"
     ".yaml", "network.ANCHOR_SCALES"),
    ("resnet_v1_101_coco_trainvalminus_rcnn_fpn_relation_learn_nms_8epoch"
     ".yaml", "network.NUM_ANCHORS"),
}

# reference config.py defaults for keys its yamls omit but ours state
# explicitly (relation_rcnn/config/config.py)
REF_DEFAULTS = {
    "network.NMS_TARGET_THRESH": "0.5",   # unused unless LEARN_NMS
    "TRAIN.LEARN_NMS": False,
    "TRAIN.JOINT_TRAINING": False,
    "TRAIN.FIRST_N": 100,
    "TEST.LEARN_NMS": False,
    "TEST.FIRST_N": 0,
    "TEST.LEARN_NMS_CLASS_SCORE_TH": 0.01,
    "TEST.SOFTNMS": False,
}
# keys consumed only when LEARN_NMS is on: an explicit value in a
# non-learn-NMS yaml is inert, so it may differ from the reference default
LEARN_NMS_ONLY_KEYS = {"network.NMS_TARGET_THRESH", "TRAIN.FIRST_N",
                       "TEST.FIRST_N", "TEST.LEARN_NMS_CLASS_SCORE_TH"}


def _flat(d, prefix=""):
    out = {}
    for k, v in d.items():
        kp = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flat(v, kp))
        else:
            out[kp] = v
    return out


def _canon(v):
    """Value equality modulo YAML spelling: numbers as floats, comma strings
    as float tuples, quoted scalars unquoted."""
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return (float(v),)
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    if isinstance(v, str):
        s = v.strip().strip("'\"")
        parts = s.replace(",", " ").split()
        try:
            if len(parts) > 1:
                return tuple((float(x),) for x in parts)
            return (float(s.replace(",", "")),)
        except ValueError:
            return s
    return v


@pytest.mark.skipif(not os.path.isdir(REF_CFG_DIR),
                    reason="reference configs not mounted")
@pytest.mark.parametrize("name", sorted(
    os.path.basename(p) for p in glob.glob(os.path.join(OUR_CFG_DIR,
                                                        "*.yaml"))))
def test_yaml_matches_reference(name):
    ref_path = os.path.join(REF_CFG_DIR, name)
    assert os.path.exists(ref_path), f"no reference namesake for {name}"
    ours = _flat(yaml.safe_load(open(os.path.join(OUR_CFG_DIR, name))))
    ref = _flat(yaml.safe_load(open(ref_path)))
    learn_nms = bool(ref.get("TRAIN.LEARN_NMS", False))

    bad = []
    for key in sorted(set(ours) | set(ref)):
        if key in IGNORED or (name, key) in ALLOWED:
            continue
        if key in ours and key in ref:
            if _canon(ours[key]) != _canon(ref[key]):
                bad.append(f"{key}: ours={ours[key]!r} ref={ref[key]!r}")
        elif key in ref:
            bad.append(f"{key}: MISSING here, ref={ref[key]!r}")
        else:
            # we state it explicitly; must equal the reference default
            # (or be inert: learn-NMS-only keys in a non-learn-NMS config)
            if key in REF_DEFAULTS:
                if _canon(ours[key]) != _canon(REF_DEFAULTS[key]):
                    if not (key in LEARN_NMS_ONLY_KEYS and not learn_nms):
                        bad.append(f"{key}: ours={ours[key]!r} != reference "
                                   f"default {REF_DEFAULTS[key]!r}")
            else:
                bad.append(f"{key}: extra key with no reference default "
                           f"recorded (ours={ours[key]!r})")
    assert not bad, f"{name} diverges from the reference:\n  " + \
        "\n  ".join(bad)


def test_all_ten_reference_configs_mirrored():
    """Every reference experiment yaml has a namesake here (SURVEY §2.1)."""
    if not os.path.isdir(REF_CFG_DIR):
        pytest.skip("reference configs not mounted")
    ref = {os.path.basename(p)
           for p in glob.glob(os.path.join(REF_CFG_DIR, "*.yaml"))}
    ours = {os.path.basename(p)
            for p in glob.glob(os.path.join(OUR_CFG_DIR, "*.yaml"))}
    assert ref <= ours, f"missing configs: {sorted(ref - ours)}"


def test_resolve_proposal_file(tmp_path, monkeypatch):
    """experiments/test.py HAS_RPN=false proposal resolution: reference
    proposal_cache/rpn_data layout wins, then flat, then the
    rcnn_train_test.py output layout; a miss is a hard error naming paths."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "experiments"))
    import importlib
    test_mod = importlib.import_module("test")
    from relation_tpu.config.defaults import load_config

    cfg = load_config(os.path.join(
        OUR_CFG_DIR,
        "resnet_v1_101_coco_trainvalminus_rcnn_fpn_relation_learn_nms_"
        "8epoch.yaml"))
    assert not cfg.TEST.HAS_RPN          # the aligned reference value
    cfg.dataset.proposal_cache = str(tmp_path / "cache")
    cfg.output_path = str(tmp_path / "out")

    with pytest.raises(FileNotFoundError, match="cached proposals"):
        test_mod.resolve_proposal_file(cfg, "cfgname")

    s = cfg.dataset.test_image_set
    out_pkl = (tmp_path / "out" / "cfgname" / cfg.dataset.image_set /
               f"{s}_rpn.pkl")
    out_pkl.parent.mkdir(parents=True)
    out_pkl.write_bytes(b"x")
    assert test_mod.resolve_proposal_file(cfg, "cfgname") == str(out_pkl)

    ref_pkl = tmp_path / "cache" / "rpn_data" / f"{s}_rpn.pkl"
    ref_pkl.parent.mkdir(parents=True)
    ref_pkl.write_bytes(b"x")
    assert test_mod.resolve_proposal_file(cfg, "cfgname") == str(ref_pkl)
