"""Checkpoint save/load/resume + reference weight-compatibility utilities.

Reference behaviors mirrored:
- per-epoch checkpoint with optimizer state (train_end2end.py:151-152,
  module_checkpoint(save_optimizer_states=True))
- ``do_checkpoint`` folds the bbox target normalization into shadow ``*_test``
  weights at save time (core/callback.py:54-61: W_test = W^T * stds,
  b_test = b * stds + means); at eval, load_param(process=True) swaps them in
  (lib/utils/load_model.py:46-67). Here the fold is provided as an explicit
  function over the param tree; the predictor can alternatively un-normalize
  deltas at decode time (core/predictor.py), which is bit-equivalent.
- resume: restore params + optimizer state + step (train_end2end.py:105-125).

Format: flax.serialization msgpack (single file per checkpoint) — no external
dependency beyond flax, works for multi-GB trees via memory-mapped bytes.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, state) -> str:
    """Serialize a TrainState (params + opt_state + step + rng) to ``path``."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "step": np.asarray(state.step),
        "params": serialization.to_state_dict(
            jax.tree.map(np.asarray, state.params)),
        "opt_state": serialization.to_state_dict(
            jax.tree.map(np.asarray, state.opt_state)),
        "rng": np.asarray(state.rng),
    }
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return path


def restore_checkpoint(path: str, state):
    """Restore into an existing TrainState template (shapes must match)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return state.replace(
        step=jax.numpy.asarray(payload["step"]),
        params=serialization.from_state_dict(state.params, payload["params"]),
        opt_state=serialization.from_state_dict(state.opt_state,
                                                payload["opt_state"]),
        rng=jax.numpy.asarray(payload["rng"]),
    )


def save_params(path: str, params, meta: dict | None = None) -> str:
    """Write a params-only msgpack; ``meta`` (plain strings) rides along under
    a reserved ``__meta__`` key that loaders strip (e.g. the reference-weight
    converter tags its output so eval can default to exact ROIPooling)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = dict(jax.tree.map(np.asarray, params))
    if meta:
        payload["__meta__"] = {str(k): str(v) for k, v in meta.items()}
    blob = serialization.msgpack_serialize(payload)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def read_params_blob(path: str) -> tuple[dict | list, dict]:
    """ONE msgpack restore of a checkpoint file -> ``(blob, meta)``.

    ``blob`` is the raw restored tree with ``__meta__`` stripped; ``meta`` is
    that dict ({} if absent). Callers that need the meta BEFORE the template
    exists (experiments/test.py reads ``roi_method`` to configure the model it
    then loads into) hold the blob and finish with :func:`params_from_blob` —
    a multi-GB flagship checkpoint is deserialized exactly once.
    """
    with open(path, "rb") as f:
        restored = serialization.msgpack_restore(f.read())
    meta = {}
    if isinstance(restored, dict):
        meta = dict(restored.pop("__meta__", None) or {})
    return restored, meta


def params_from_blob(blob, template):
    """Finish a :func:`read_params_blob` load into ``template``'s structure.

    Accepts BOTH on-disk formats (the reference eval path accepts either the
    raw epoch params or the processed ``*_test`` checkpoint,
    lib/utils/load_model.py:46-67):
      - a params-only msgpack written by :func:`save_params`
      - a full TrainState blob written by :func:`save_checkpoint` (sniffed by
        its {step, params, opt_state, rng} key set; the params subtree is
        extracted)
    """
    if isinstance(blob, dict) and \
            {"step", "params", "opt_state", "rng"} <= set(blob):
        blob = blob["params"]
    return serialization.from_state_dict(template, blob)


def read_checkpoint_meta(path: str) -> dict:
    """Return the ``__meta__`` dict of a params msgpack ({} if absent)."""
    return read_params_blob(path)[1]


def load_params(path: str, template):
    """One-call convenience: :func:`read_params_blob` + :func:`params_from_blob`."""
    return params_from_blob(read_params_blob(path)[0], template)


def check_parameter_shapes(loaded, template) -> None:
    """Validate every loaded leaf against the model's expected shapes.

    Equivalent of Symbol.check_parameter_shapes (reference lib/utils/symbol.py:38-56),
    which raises on any mismatch before binding.
    """
    from flax.traverse_util import flatten_dict
    got = flatten_dict(loaded)
    want = flatten_dict(template)
    missing = set(want) - set(got)
    extra = set(got) - set(want)
    if missing:
        raise ValueError(f"missing params: {sorted('/'.join(p) for p in missing)}")
    if extra:
        raise ValueError(f"unexpected params: {sorted('/'.join(p) for p in extra)}")
    for path, v in want.items():
        if tuple(np.shape(got[path])) != tuple(np.shape(v)):
            raise ValueError(
                f"shape mismatch for {'/'.join(path)}: loaded "
                f"{np.shape(got[path])} vs expected {np.shape(v)}")


def fold_bbox_normalization(params, means, stds):
    """Bake BBOX_MEANS/STDS into the bbox_pred layer (reference callback.py:54-61).

    After folding, raw bbox_pred outputs are de-normalized deltas; the predictor
    must then be built with stds/means disabled. kernel: [in, 4K]; per-output
    column scaling by stds (tiled), bias b*stds + means.
    """
    params = jax.tree.map(lambda x: x, params)  # shallow copy
    bp = dict(params["bbox_pred"])
    k = bp["kernel"]
    b = bp["bias"]
    reps = b.shape[0] // 4
    stds_t = np.tile(np.asarray(stds, k.dtype), reps)
    means_t = np.tile(np.asarray(means, k.dtype), reps)
    bp["kernel"] = k * stds_t[None, :]
    bp["bias"] = b * stds_t + means_t
    out = dict(params)
    out["bbox_pred"] = bp
    return out


# ---------------------------------------------------------------------------
# Reference (MXNet .params) name mapping
# ---------------------------------------------------------------------------

def reference_name_map(params) -> dict[str, tuple]:
    """Map reference MXNet arg/aux names -> (path in our tree, transform tag).

    Transform tags:
      'conv'   MXNet [out, in, kh, kw] -> ours [kh, kw, in, out] (transpose 2,3,1,0)
      'dense'  MXNet [out, in]         -> ours [in, out] (transpose)
      'dense_chw' first FC after ROI pooling: MXNet flattens NCHW (c,h,w), ours
                  flattens NHWC (h,w,c) — permute the input dim before transposing
      'grouped' linear_out_*: MXNet grouped conv [out, in/g, 1, 1] -> ours
                  [g, in/g, out/g]
      'raw'    copy as-is (biases, BN vectors)
    Used by tools/convert_reference_params.py.
    """
    from flax.traverse_util import flatten_dict
    flat = flatten_dict(params)
    out = {}
    for path in flat:
        comps = path
        name = comps[-2] if comps[-1] in ("kernel", "bias") else comps[-2]
        leaf = comps[-1]
        mod = comps[-2]
        if leaf == "kernel":
            if mod.startswith(("res", "conv1", "rpn_conv", "rpn_cls", "rpn_bbox",
                               "conv_new", "tiny")):
                out[f"{mod}_weight"] = (path, "conv")
            elif mod == "fc_new_1":
                out[f"{mod}_weight"] = (path, "dense_chw")
            else:
                out[f"{mod}_weight"] = (path, "dense")
        elif leaf == "bias":
            out[f"{mod}_bias"] = (path, "raw")
        elif leaf in ("gamma", "beta"):
            out[f"{mod}_{leaf}"] = (path, "raw")
        elif leaf in ("moving_mean", "moving_var"):
            out[f"{mod}_{leaf}"] = (path, "raw")
        elif leaf.endswith("_weight"):        # grouped linear_out params
            out[leaf] = (path, "grouped")
        elif leaf.endswith("_bias"):
            out[leaf] = (path, "raw")
    return out
