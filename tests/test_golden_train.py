"""Golden TRAIN-step fixtures: frozen tiny weights + fixed batch -> exact
losses, metrics and parameter-update norm, for every reference symbol family.

The grad-path regression net the round-3 verdict asked for (missing #2): the
backward graph keeps getting reworked for speed (custom-vjp gathers in
ops/gathers.py, the Pallas geom-bias backward, stop-gradient freeze DCE in
core/trainer.py) — these fixtures pin one full train step (forward losses,
gradients, SGD+momentum update) so a silent numeric regression anywhere in
the backward path fails a test. The reference has no train-step oracle beyond
its converged mAP table; a pinned (loss, metrics, ||Δparams||) tuple is the
equivalent cheap certificate.

Same determinism recipe as tests/test_golden_e2e.py: CRC-seeded synthetic
params, fixed numpy batch, CPU backend with matmul precision 'highest'
(conftest.py) -> bit-stable, exact equality. Regenerate intended changes with:

    python tests/test_golden_train.py --regen
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if __name__ == "__main__":
    # replicate conftest.py's environment for regen (see test_golden_e2e.py)
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=8")
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")
    _jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import jax
import jax.numpy as jnp

from relation_tpu.core.trainer import (build_model, make_train_step,
                                       create_train_state)
from tests.test_golden_e2e import FAMILIES, family_cfg, synth_params, GOLDEN_DIR


def _fixed_batch(seed: int = 7, B: int = 2, size: int = 64, max_gt: int = 4):
    r = np.random.RandomState(seed)
    gt = np.zeros((B, max_gt, 5), np.float32)
    gv = np.zeros((B, max_gt), bool)
    for b in range(B):
        gt[b, 0] = [8, 10, 30, 34, 1 + b % 3]
        gt[b, 1] = [24, 28, 52, 58, 2]
        gv[b, :2] = True
    return {"image": (r.randn(B, size, size, 3) * 40).astype(np.float32),
            "im_info": np.tile([[size, size, 1.0]], (B, 1)).astype(np.float32),
            "gt_boxes": gt, "gt_valid": gv}


def run_train_family(family: str):
    """One jitted train step from CRC-synthesized params on the fixed batch;
    returns {metric name: float} + 'update_norm' (global L2 of params delta,
    accumulated in f64) + 'update_count' (leaves that moved)."""
    cfg = family_cfg(family)
    model = build_model(cfg, tiny=True)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               jnp.zeros((64, 64, 3)),
                               jnp.asarray([64.0, 64.0, 1.0]))
    shapes = jax.tree.map(lambda p: jax.ShapeDtypeStruct(p.shape, p.dtype),
                          state.params)
    params = synth_params(shapes)
    state = state.replace(params=params, opt_state=state.tx.init(params))

    step = make_train_step(model, cfg)
    batch = jax.tree.map(jnp.asarray, _fixed_batch())
    state2, metrics = jax.jit(step)(state, batch)

    out = {k: np.float64(v) for k, v in jax.tree.map(float, metrics).items()}
    sq, moved = 0.0, 0
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(state2.params)):
        d = np.asarray(b, np.float64) - np.asarray(a, np.float64)
        s = float(np.sum(d * d))
        sq += s
        moved += int(s > 0)
    out["update_norm"] = np.float64(np.sqrt(sq))
    out["update_count"] = np.float64(moved)
    return out


def _path(family):
    return os.path.join(GOLDEN_DIR, f"train_{family}.npz")


def _check_train_family(family):
    with np.load(_path(family)) as z:
        want = {k: z[k] for k in z.files}
    got = run_train_family(family)
    assert set(got) == set(want), (sorted(got), sorted(want))
    for k in sorted(want):
        np.testing.assert_array_equal(
            got[k], want[k],
            err_msg=f"{family}/{k}: train-step golden drifted. If INTENDED, "
                    f"regenerate via `python tests/test_golden_train.py "
                    f"--regen`.")
    assert want["update_norm"] > 0, f"{family}: nothing trained"
    assert np.isfinite(want["total_loss"])


def test_golden_train_plain():
    _check_train_family("plain")


def test_golden_train_dcn():
    _check_train_family("dcn")


def test_golden_train_fpn():
    _check_train_family("fpn")


def test_golden_train_plain_learn_nms():
    _check_train_family("plain_learn_nms")


def test_golden_train_dcn_learn_nms():
    _check_train_family("dcn_learn_nms")


def test_golden_train_fpn_learn_nms():
    _check_train_family("fpn_learn_nms")


def test_golden_train_plain_relation():
    _check_train_family("plain_relation")


def test_golden_train_dcn_relation():
    _check_train_family("dcn_relation")


def test_golden_train_fpn_relation():
    _check_train_family("fpn_relation")


def test_golden_train_learn_nms_only():
    _check_train_family("learn_nms_only")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--regen", action="store_true")
    ap.add_argument("--families", nargs="+", default=None)
    args = ap.parse_args()
    if args.regen:
        for fam in (args.families or FAMILIES):
            got = run_train_family(fam)
            np.savez_compressed(_path(fam), **got)
            print(f"{fam}: total_loss={got['total_loss']:.6f} "
                  f"update_norm={got['update_norm']:.6e} "
                  f"moved={int(got['update_count'])}")
    else:
        print("use --regen to (re)write tests/golden/train_*.npz")
