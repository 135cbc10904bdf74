"""In-context A/B: exact ROIPooling (parity path) vs MXU ROIAlign on TPU.

Flagship model e2e at 608x1024, only TPU.ROI_METHOD differs. Same async-tunnel
methodology as bench.py. The VERDICT-r1 requirement: exact-pool must be a
usable parity default for converted-weights eval, so its e2e cost is recorded
in BASELINE.md next to the align number.

Run: python tools/bench_roi_method.py
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def measure(fn, params, image, im_info, n=100, k=3):
    import jax
    import jax.numpy as jnp

    def chained(params, image, im_info, n):
        def body(img, _):
            dets = fn(params, img, im_info)
            img = img + jnp.abs(dets[0, 1]) * 1e-30
            return img, dets[0, 1]
        img, outs = jax.lax.scan(body, image, None, length=n)
        return outs[-1]

    jfn = jax.jit(chained, static_argnums=(3,))
    _ = np.asarray(jfn(params, image, im_info, n))
    g = jax.jit(lambda a: a + 1)
    _ = np.asarray(g(jnp.zeros(())))
    rts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(g(jnp.zeros(())))
        rts.append(time.perf_counter() - t0)
    rt = min(rts)
    best = float("inf")
    for _ in range(k):
        t0 = time.perf_counter()
        _ = np.asarray(jfn(params, image, im_info, n))
        best = min(best, time.perf_counter() - t0 - rt)
    return best / n * 1e3


def build(roi_method: str):
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_cfg
    from relation_tpu.core.trainer import build_model
    from relation_tpu.core.predictor import make_predict_fn

    cfg = _flagship_cfg()
    cfg.TPU.ROI_METHOD = roi_method
    model = build_model(cfg)
    H, W = 608, 1024
    n0 = int(cfg.TEST.FIRST_N) + 1
    rois0 = jnp.tile(jnp.asarray([[0.0, 0.0, 32.0, 32.0]]), (n0, 1))
    im_info = jnp.asarray([600.0, 1000.0, 1.667], jnp.float32)
    image = jnp.zeros((12, H // 2, W // 2), jnp.float32)
    params = jax.jit(model.init, static_argnums=(4,))(
        jax.random.PRNGKey(0), image, rois0, im_info, n0)["params"]
    predict = make_predict_fn(model, cfg, (H // 16, W // 16))

    def fn(params, img, im_info):
        return predict(params, img, im_info)["dets"]
    return fn, params, image, im_info


def main():
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    for method in ("align", "pool"):
        fn, params, image, im_info = build(method)
        img = jnp.asarray(rng.randn(*image.shape).astype(np.float32) * 40)
        ms = measure(fn, params, img, im_info)
        print(json.dumps({"roi_method": method, "value": round(ms, 3),
                          "unit": "ms/image e2e"}), flush=True)


if __name__ == "__main__":
    main()
