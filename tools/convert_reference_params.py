"""Convert reference MXNet checkpoints (rcnn_coco-0008.params etc.) into
relation_tpu param trees.

Input: either a real .params file (parsed directly — format: mx.nd.save) or an
.npz/pickle of {name: ndarray}. Output: msgpack params loadable by
relation_tpu.core.checkpoint.load_params.

Layout transforms (MXNet NCHW / [out,in] vs our NHWC / [in,out]):
  conv weight      [O, I, kh, kw]  -> [kh, kw, I, O]
  dense weight     [O, I]          -> [I, O]
  fc after ROI pool: MXNet flattens pooled NCHW as (c, h, w); ours flattens NHWC
      as (h, w, c) -> permute the input axis before transposing
  grouped linear_out_{i} [D, F, 1, 1] (G groups) -> [G, F, D // G]
  BN aux moving_mean/var + gamma/beta -> FrozenBatchNorm params
  bbox_pred(+_test): the reference checkpoint carries std-folded *_test shadows
      (core/callback.py:54-61); pass --use-test-weights to load those (then run
      eval without delta un-normalization).

Usage:
  python tools/convert_reference_params.py --src rcnn_coco-0008.params \
      --cfg experiments/cfgs/..._relation_learn_nms_8epoch.yaml --out params.msgpack
"""

from __future__ import annotations

import argparse
import pickle
import struct
import sys

import numpy as np

# ---------------------------------------------------------------------------
# MXNet .params parsing (mx.nd.save format) without mxnet
# ---------------------------------------------------------------------------

_MX_MAGIC = 0x112  # NDArray list file magic (mxnet ndarray.cc kMXAPINDArrayListMagic)

_DTYPE_MAP = {0: np.float32, 1: np.float64, 2: np.float16, 3: np.uint8,
              4: np.int32, 5: np.int8, 6: np.int64}


def load_mxnet_params(path: str) -> dict[str, np.ndarray]:
    """Parse an mx.nd.save file: header (magic, reserved), ndarray blobs, keys."""
    with open(path, "rb") as f:
        data = f.read()
    off = 0

    def u64():
        nonlocal off
        v = struct.unpack_from("<Q", data, off)[0]
        off += 8
        return v

    def u32():
        nonlocal off
        v = struct.unpack_from("<I", data, off)[0]
        off += 4
        return v

    magic = u64()
    if magic != _MX_MAGIC:
        raise ValueError(f"not an mx.nd.save file (magic {magic:#x})")
    u64()  # reserved
    num_arrays = u64()
    arrays = []
    for _ in range(num_arrays):
        # NDArray::Load (legacy dense format, mxnet <= 1.x)
        nd_magic = u32()
        if nd_magic == 0xF993FAC9:          # NDARRAY_V2 magic
            stype = u32()
            if stype != 1:                   # kDefaultStorage
                raise ValueError("sparse ndarrays unsupported")
            ndim = u32()
            shape = tuple(u64() for _ in range(ndim))
        elif nd_magic == 0xF993FAC8:        # NDARRAY_V1 magic
            ndim = u32()
            shape = tuple(u64() for _ in range(ndim))
        else:
            # legacy: magic was actually ndim (TShape::Load)
            ndim = nd_magic
            shape = tuple(u64() for _ in range(ndim))
        dev_type = u32()   # context
        dev_id = u32()
        del dev_type, dev_id
        dtype = u32()
        arr = np.frombuffer(
            data, dtype=_DTYPE_MAP[dtype], offset=off,
            count=int(np.prod(shape)) if shape else 1).reshape(shape)
        off += arr.nbytes
        arrays.append(arr.copy())
    num_keys = u64()
    keys = []
    for _ in range(num_keys):
        n = u64()
        keys.append(data[off:off + n].decode())
        off += n
    return dict(zip(keys, arrays))


def load_any(path: str) -> dict[str, np.ndarray]:
    if path.endswith(".npz"):
        return dict(np.load(path))
    if path.endswith((".pkl", ".pickle")):
        with open(path, "rb") as f:
            return {k: np.asarray(v) for k, v in pickle.load(f).items()}
    return load_mxnet_params(path)


# ---------------------------------------------------------------------------
# name mapping
# ---------------------------------------------------------------------------

def strip_prefixes(raw: dict) -> dict:
    """mx checkpoints prefix entries with 'arg:'/'aux:'."""
    out = {}
    for k, v in raw.items():
        if ":" in k:
            k = k.split(":", 1)[1]
        out[k] = v
    return out


def convert(raw: dict[str, np.ndarray], params_template,
            use_test_weights: bool = False, pooled_hw: int = 7,
            pooled_c: int = 256):
    """Fill a relation_tpu param tree from reference-named arrays.

    Returns (params, missing_names, unused_reference_names).
    """
    from flax.traverse_util import flatten_dict, unflatten_dict

    raw = strip_prefixes(raw)
    if use_test_weights:
        # swap the std-folded *_test shadows in, exactly load_param(process=True)
        # (reference lib/utils/load_model.py:46-67 renames '*_test' -> base name)
        for base in ("bbox_pred_weight", "bbox_pred_bias"):
            if base + "_test" in raw:
                raw[base] = raw[base + "_test"]

    flat = flatten_dict(params_template)
    out = {}
    missing = []
    used = set()

    def take(name):
        used.add(name)
        return raw[name]

    for path, tpl in flat.items():
        mod, leaf = path[-2], path[-1]
        try:
            if leaf == "kernel":
                w = None
                if mod + "_weight" in raw:
                    w = take(mod + "_weight")
                if w is None:
                    missing.append("/".join(path))
                    continue
                if w.ndim == 4:                        # conv OIHW -> HWIO
                    arr = w.transpose(2, 3, 1, 0)
                elif mod in ("fc_new_1", "roi_pool_fc1"):
                    # [O, C*H*W] -> [(h,w,c) flat, O]
                    o = w.shape[0]
                    arr = (w.reshape(o, pooled_c, pooled_hw, pooled_hw)
                           .transpose(2, 3, 1, 0).reshape(-1, o))
                else:                                   # dense [O, I] -> [I, O]
                    arr = w.T
            elif leaf == "bias":
                arr = take(mod + "_bias")
            elif leaf in ("gamma", "beta"):
                arr = take(mod + "_" + leaf)
            elif leaf in ("moving_mean", "moving_var"):
                arr = take(mod + "_" + leaf)
            elif leaf.endswith("_weight") and "linear_out" in leaf:
                # grouped conv [D, F, 1, 1] -> [G, F, D/G]
                w = take(leaf)
                d, fdim = w.shape[0], w.shape[1]
                g = np.prod(tpl.shape[0:1])
                arr = (w.reshape(int(g), d // int(g), fdim, 1, 1)
                       .transpose(0, 2, 1, 3, 4).reshape(tpl.shape))
            elif leaf.endswith("_weight"):              # dcn branch2b etc [O,I,kh,kw]
                arr = take(leaf).transpose(2, 3, 1, 0)
            elif leaf.endswith("_bias"):
                arr = take(leaf)
            else:
                missing.append("/".join(path))
                continue
        except KeyError:
            missing.append("/".join(path))
            continue
        if tuple(arr.shape) != tuple(np.shape(tpl)):
            raise ValueError(f"{'/'.join(path)}: converted shape {arr.shape} != "
                             f"expected {np.shape(tpl)}")
        out[path] = np.ascontiguousarray(arr, np.float32)

    for path, tpl in flat.items():
        if path not in out:
            out[path] = np.asarray(tpl)                 # keep template init
    unused = sorted(set(raw) - used)
    return unflatten_dict(out), missing, unused


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True)
    p.add_argument("--cfg", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--use-test-weights", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="tiny-backbone template (rehearsal/testing; must match "
                        "the model the checkpoint was saved from)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from relation_tpu.config.defaults import load_config
    from relation_tpu.core.trainer import build_model
    from relation_tpu.core.checkpoint import save_params

    cfg = load_config(args.cfg)
    model = build_model(cfg, tiny=args.tiny)
    n0 = max(int(cfg.TEST.FIRST_N) + 1, 8)
    rois0 = jnp.tile(jnp.asarray([[0.0, 0.0, 32.0, 32.0]]), (n0, 1))
    template = jax.jit(model.init, static_argnums=(4,))(
        jax.random.PRNGKey(0), jnp.zeros((128, 128, 3)), rois0,
        jnp.asarray([128.0, 128.0, 1.0]), n0)["params"]

    raw = load_any(args.src)
    params, missing, unused = convert(raw, template,
                                      use_test_weights=args.use_test_weights)
    print(f"converted; {len(missing)} missing (left at init), "
          f"{len(unused)} unused reference arrays")
    for m in missing[:20]:
        print("  missing:", m)
    for u in unused[:20]:
        print("  unused:", u)
    # tag the output so eval defaults to exact ROIPooling (the reference head
    # is rounding max-pool ROIPooling, resnet_v1_101_rcnn_base.py:790-791;
    # ROIAlign under converted weights would not reproduce its detections)
    save_params(args.out, params, meta={
        "source": "mxnet_reference",
        "roi_method": "pool",
        "test_weights": str(bool(args.use_test_weights)).lower(),
    })
    print("wrote", args.out)


if __name__ == "__main__":
    main()
