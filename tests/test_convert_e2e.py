"""Converted-checkpoint END-TO-END rehearsal (round-4 verdict task 5).

Exercises the exact handoff a real ``rcnn_coco-0008.params`` would take —
the one path COCO-minival parity would ride if the dataset/checkpoint were
mounted (reference: lib/utils/load_model.py:46-67 loads the .params file,
function/test_rcnn.py:57 feeds it to the Predictor):

  1. synthesize an mx.nd.save checkpoint (byte-exact writer) for the tiny
     flagship model,
  2. run ``tools/convert_reference_params.py``'s main() CLI (the real tool:
     parse -> name-map -> layout transforms -> msgpack with __meta__ tags),
  3. drive the converted msgpack through ``experiments/test.py``'s main()
     (read_params_blob -> params_from_blob -> meta roi_method handoff ->
     pred_eval over a real on-disk mini COCO dataset),
  4. assert the detections equal pred_eval fed the SAME weights directly
     (no file round trip) under the same meta-implied config.

Any break anywhere in the chain — the .params parser, a transform, msgpack
IO, the driver's __meta__ handling, the eval loop — shows up as a detection
mismatch or a crash here.
"""

import json
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flax.traverse_util import flatten_dict

from tests.test_convert_params import template_to_mx_raw, write_mx_nd_save

TEST_SET = "minitest"

TINY_YAML = """\
symbol: resnet_v1_101_rcnn_attention_1024_pairwise_position_multi_head_16_learn_nms
CLASS_AGNOSTIC: true
SCALES: [64, 64]
dataset:
  dataset: coco
  test_image_set: minitest
  NUM_CLASSES: 5
network:
  ANCHOR_SCALES: [2, 4]
  ANCHOR_RATIOS: [0.5, 1, 2]
  NUM_ANCHORS: 6
  NMS_TARGET_THRESH: '0.5, 0.7'
TRAIN:
  LEARN_NMS: true
  BATCH_ROIS: -1
  FIRST_N: 8
  BBOX_NORMALIZATION_PRECOMPUTED: true
TEST:
  HAS_RPN: true
  LEARN_NMS: true
  FIRST_N: 8
  RPN_PRE_NMS_TOP_N: 64
  RPN_POST_NMS_TOP_N: 24
  RPN_MIN_SIZE: 0
  max_per_image: 10
TPU:
  IMAGE_BUCKETS: [[64, 64]]
  MAX_GT: 8
"""


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    """A real on-disk COCO-layout dataset: 3 PNG images + annotations JSON,
    under <root>/images/minitest and <root>/annotations/instances_minitest.json
    (the layout experiments/test.py resolves from cfg.dataset.dataset_path)."""
    from PIL import Image

    root = tmp_path_factory.mktemp("mini_coco")
    (root / "annotations").mkdir()
    img_dir = root / "images" / TEST_SET
    img_dir.mkdir(parents=True)

    rng = np.random.RandomState(7)
    images, anns = [], []
    for i in range(3):
        arr = rng.randint(0, 255, (64, 64, 3), np.uint8)
        name = f"im{i}.png"
        Image.fromarray(arr).save(img_dir / name)
        images.append({"id": i + 1, "file_name": name,
                       "height": 64, "width": 64})
        anns.append({"id": i + 1, "image_id": i + 1,
                     "category_id": (i % 4) + 1,
                     "bbox": [8.0 + i, 8.0, 20.0, 20.0],
                     "area": 400.0, "iscrowd": 0})
    cats = [{"id": c + 1, "name": f"thing{c}"} for c in range(4)]
    (root / "annotations" / f"instances_{TEST_SET}.json").write_text(
        json.dumps({"images": images, "annotations": anns,
                    "categories": cats}))
    return root


def _run_cli(module_main, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", argv)
    return module_main()


def test_converted_checkpoint_drives_test_py(mini_dataset, tmp_path,
                                             monkeypatch, rng):
    from relation_tpu.config.defaults import load_config
    from relation_tpu.core.trainer import build_model
    from relation_tpu.core.checkpoint import read_params_blob
    from relation_tpu.core.evaluator import pred_eval
    from relation_tpu.data.coco import CocoDataset
    import tools.convert_reference_params as convert_tool
    import importlib.util

    cfg_file = tmp_path / "tiny_flagship.yaml"
    cfg_file.write_text(TINY_YAML + f"output_path: {tmp_path / 'out'}\n")

    # ---- 1. synthesize the mx.nd.save checkpoint -------------------------
    cfg = load_config(str(cfg_file))
    model = build_model(cfg, tiny=True)
    n0 = max(int(cfg.TEST.FIRST_N) + 1, 8)
    rois0 = jnp.tile(jnp.asarray([[0.0, 0.0, 32.0, 32.0]]), (n0, 1))
    # same (key, shapes) init the converter's template uses -> identical tree
    template = jax.jit(model.init, static_argnums=(4,))(
        jax.random.PRNGKey(0), jnp.zeros((64, 64, 3)), rois0,
        jnp.asarray([64.0, 64.0, 1.0]), n0)["params"]
    raw, want = template_to_mx_raw(flatten_dict(template), rng)
    named = {("aux:" if "moving" in k else "arg:") + k: v
             for k, v in raw.items()}
    params_file = tmp_path / "rcnn_coco-0008.params"
    write_mx_nd_save(str(params_file), named)

    # ---- 2. the real converter CLI --------------------------------------
    out_msgpack = tmp_path / "converted.params.msgpack"
    _run_cli(convert_tool.main,
             ["convert_reference_params.py", "--src", str(params_file),
              "--cfg", str(cfg_file), "--out", str(out_msgpack), "--tiny"],
             monkeypatch)
    blob, meta = read_params_blob(str(out_msgpack))
    assert meta.get("roi_method") == "pool"      # the __meta__ parity tag
    assert meta.get("source") == "mxnet_reference"

    # ---- 3. experiments/test.py with the converted checkpoint -----------
    spec = importlib.util.spec_from_file_location("exp_test_driver",
                                                  "experiments/test.py")
    driver = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(driver)
    results, dets = _run_cli(
        driver.main,
        ["test.py", "--cfg", str(cfg_file), "--ckpt", str(out_msgpack),
         "--tiny", "--dataset-path", str(mini_dataset), "--ignore-cache"],
        monkeypatch)
    assert set(dets) == {1, 2, 3}
    assert isinstance(results, dict) and results, results

    # ---- 4. the same weights fed to pred_eval directly ------------------
    # the driver's __meta__ handoff (experiments/test.py:143-159) flips the
    # exact-parity knobs; mirror them so the graphs match
    cfg2 = load_config(str(cfg_file))
    cfg2.TPU.ROI_METHOD = "pool"
    cfg2.TPU.FPN_TOPK = "exact"
    cfg2.TPU.GEOM_EMB_DTYPE = "float32"
    cfg2.TPU.NMS_COMPACT_CLASSES = 0
    cfg2.TEST.SCORE_THRESH = 1e-3                # the driver's --thresh default
    model2 = build_model(cfg2, tiny=True)
    flat = dict(flatten_dict(template))
    flat.update(want)                            # mapped leaves -> mx values
    from flax.traverse_util import unflatten_dict
    params_direct = unflatten_dict(
        {p: jnp.asarray(np.asarray(v, np.float32)) for p, v in flat.items()})

    s = cfg2.dataset.test_image_set
    ds = CocoDataset(
        str(mini_dataset / "annotations" / f"instances_{s}.json"),
        str(mini_dataset / "images" / s))
    results2, dets2 = pred_eval(model2, params_direct, cfg2, ds, ds.roidb())

    assert set(dets2) == set(dets)
    for k in dets:
        np.testing.assert_array_equal(
            np.asarray(dets[k]), np.asarray(dets2[k]),
            err_msg=f"image {k}: driver path != direct params")
    assert set(results) == set(results2)
    for stat, v in results2.items():
        if stat == "per_class":                  # nested {class_id: AP} dict
            assert set(results[stat]) == set(v)
            for c, ap in v.items():
                a = results[stat][c]
                assert (np.isnan(a) and np.isnan(ap)) or a == ap, (c, a, ap)
            continue
        np.testing.assert_equal(results[stat], v,
                                err_msg=f"COCO stat {stat}")
