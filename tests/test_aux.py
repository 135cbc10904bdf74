"""Auxiliary subsystems: checkpoint round trip + shape validation, bbox fold,
monitor op, visualization, LR schedule."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from relation_tpu.core.checkpoint import (save_checkpoint, restore_checkpoint,
                                          save_params, load_params,
                                          check_parameter_shapes,
                                          fold_bbox_normalization)
from relation_tpu.utils.debug import monitor
from relation_tpu.utils.vis import draw_detections
from relation_tpu.utils.lr import warmup_multi_factor_schedule


def test_checkpoint_roundtrip(tmp_path, rng):
    from relation_tpu.core.trainer import build_model, create_train_state
    from tests.test_train_predict import tiny_cfg
    cfg = tiny_cfg()
    model = build_model(cfg, tiny=True)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               jnp.zeros((64, 64, 3)),
                               jnp.asarray([64.0, 64.0, 1.0]))
    p = str(tmp_path / "ck.msgpack")
    save_checkpoint(p, state.replace(step=jnp.asarray(7)))
    restored = restore_checkpoint(p, state)
    assert int(restored.step) == 7
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # params-only save/load + shape validation
    pp = str(tmp_path / "params.msgpack")
    save_params(pp, state.params)
    loaded = load_params(pp, state.params)
    check_parameter_shapes(loaded, state.params)
    bad = jax.tree.map(lambda x: x, loaded)
    bad["cls_score"]["bias"] = np.zeros(99)
    with pytest.raises(ValueError, match="shape mismatch"):
        check_parameter_shapes(bad, state.params)


def test_fold_bbox_normalization(rng):
    params = {"bbox_pred": {"kernel": rng.randn(16, 8).astype(np.float32),
                            "bias": rng.randn(8).astype(np.float32)}}
    stds = (0.1, 0.1, 0.2, 0.2)
    means = (0.0, 0.1, 0.0, 0.05)
    folded = fold_bbox_normalization(params, means, stds)
    x = rng.randn(3, 16).astype(np.float32)
    raw = x @ params["bbox_pred"]["kernel"] + params["bbox_pred"]["bias"]
    want = raw * np.tile(stds, 2) + np.tile(means, 2)
    got = x @ folded["bbox_pred"]["kernel"] + folded["bbox_pred"]["bias"]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_monitor_identity_and_grad():
    x = jnp.asarray([1.0, 2.0, 3.0])
    y = jax.jit(lambda v: monitor(v, "probe") * 2)(x)
    np.testing.assert_allclose(np.asarray(y), [2, 4, 6])
    g = jax.grad(lambda v: jnp.sum(monitor(v, "g")))(x)
    np.testing.assert_allclose(np.asarray(g), [1, 1, 1])


def test_draw_detections(tmp_path, rng):
    im = rng.randint(0, 255, (120, 160, 3)).astype(np.float32)
    dets = np.asarray([[1, 0.9, 10, 10, 60, 50], [2, 0.5, 70, 30, 140, 100],
                       [-1, 0, 0, 0, 0, 0]])
    out = str(tmp_path / "vis.png")
    draw_detections(im, dets, ["bg", "cat", "dog"], out_path=out)
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_lr_schedule():
    s = warmup_multi_factor_schedule(0.1, [100, 200], 0.1, warmup=True,
                                     warmup_lr=0.01, warmup_step=10)
    assert float(s(5)) == pytest.approx(0.01)
    assert float(s(50)) == pytest.approx(0.1)
    assert float(s(150)) == pytest.approx(0.01)
    assert float(s(250)) == pytest.approx(0.001)
