"""Data-parallel step-time scaling on the virtual CPU mesh (1/2/4/8 devices).

The environment has ONE physical core and no multi-chip TPU, so all virtual
devices share one core and absolute step time grows ~linearly with the mesh
size; the meaningful scaling signal is the per-image time (step_ms / N), which
stays flat iff the pjit sharding adds no per-device overhead beyond the
compute itself (allreduce on a 1-core host is memcpy-cheap).

The reference's analogue is the 4-GPU kvstore('device') data parallelism
(core/module.py:473-518, DataParallelExecutorGroup) which it never benchmarks
in-repo; its README scale is ~1.1 s/step for batch 4 across 4 Titan X.

Each mesh size runs in a fresh subprocess (the host device count is fixed at
backend init). Usage: python tools/bench_mesh_scaling.py [N ...]
"""
import json
import os
import subprocess
import sys

WORKER = r"""
import os, sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
n = int(sys.argv[1])
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from __graft_entry__ import _flagship_cfg
from relation_tpu.core.trainer import (build_model, make_train_step,
                                       create_train_state)
from relation_tpu.parallel.mesh import make_mesh, shard_batch, replicated

cfg = _flagship_cfg(tiny_shapes=True)
# tiny TRUNK too: the full ResNet-101 runs ~13 s/step on this 1-core host,
# and the scaling signal (sharding overhead) is backbone-independent
model = build_model(cfg, tiny=True)
mesh = make_mesh(n_data=n)
H = W = 128
max_gt = 8
rng = np.random.RandomState(0)
B = n
state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                           jnp.zeros((H, W, 3)),   # tiny trunk is HWC
                           jnp.asarray([128.0, 128.0, 1.0]))
step = make_train_step(model, cfg)
gt = np.zeros((B, max_gt, 5), np.float32)
gv = np.zeros((B, max_gt), bool)
for b in range(B):
    gt[b, 0] = [10, 10, 60, 60, 1 + b % 80]
    gv[b, :1] = True
batch = {
    "image": rng.randn(B, H, W, 3).astype(np.float32),
    "im_info": np.tile(np.asarray([[128.0, 128.0, 1.0]], np.float32), (B, 1)),
    "gt_boxes": gt, "gt_valid": gv,
}
batch = shard_batch(mesh, batch)
state = jax.device_put(state, replicated(mesh))
jstep = jax.jit(step)
with mesh:
    state, m = jstep(state, batch)          # compile + warm
    float(m["total_loss"])
    reps = 8
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            state, m = jstep(state, batch)
        float(m["total_loss"])
        best = min(best, (time.perf_counter() - t0) / reps)
print("RESULT", n, best * 1e3)
"""


def main():
    ns = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    rows = []
    for n in ns:
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            f" --xla_force_host_platform_device_count={n}")
        out = subprocess.run([sys.executable, "-c", WORKER, str(n)],
                             capture_output=True, text=True, env=env,
                             timeout=3600)
        line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
        if not line:
            print(f"n={n} FAILED:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
            continue
        _, n_s, ms = line[0].split()
        rows.append((int(n_s), float(ms)))
        print(f"mesh n={n_s}: step {float(ms):8.1f} ms  "
              f"({float(ms) / int(n_s):6.1f} ms/image on 1 shared core)",
              flush=True)
    if rows:
        base = rows[0][1] / rows[0][0]
        print(json.dumps({
            "per_image_ms": {n: round(ms / n, 2) for n, ms in rows},
            "scaling_overhead_vs_n1": {
                n: round((ms / n) / base - 1, 3) for n, ms in rows},
        }))


if __name__ == "__main__":
    main()
