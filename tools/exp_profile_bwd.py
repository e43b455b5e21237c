"""Device-trace the scanned fwd+bwd train step (bench.py's headline form)
and aggregate per-fusion device time, splitting forward-ish vs
backward-ish by source attribution where possible.

Usage: python tools/exp_profile_bwd.py [logdir]
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

W = H = 800
DEPTH = 8
STEPS = 20


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.render.integrator import TraceConfig
    from project3_cuda_path_tracer_tpu.models.inverse import (
        RenderParams, make_train_scan)

    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bwd_trace"
    print("backend:", jax.default_backend(), flush=True)
    scene = load_scene(os.path.join(ROOT, "scenes/cornell.txt"))
    gt = tuple(int(t) for t in np.asarray(scene.geoms.type))
    cfg = TraceConfig(width=W, height=H, trace_depth=DEPTH,
                      antialias=True, geom_types=gt, glossy=False, sky=False)
    opt, run = make_train_scan(scene.geoms, scene.meshes, scene.textures,
                               cfg, num_steps=STEPS)
    params = jax.tree_util.tree_map(
        jnp.array, RenderParams(materials=scene.materials,
                                cam=scene.camera.flat()))
    opt_state = opt.init(params)
    target = jnp.zeros((H, W, 3), jnp.float32)
    key = jax.random.PRNGKey(0)

    params, opt_state, losses = run(params, opt_state, key, target)
    jax.block_until_ready(losses)
    t0 = time.perf_counter()
    params, opt_state, losses = run(params, opt_state,
                                    jax.random.fold_in(key, 1), target)
    jax.block_until_ready(losses)
    wall = time.perf_counter() - t0
    print(f"epoch wall: {wall*1e3:.1f} ms ({wall*1e3/STEPS:.2f} ms/step)",
          flush=True)

    with jax.profiler.trace(logdir):
        params, opt_state, losses = run(params, opt_state,
                                        jax.random.fold_in(key, 2), target)
        jax.block_until_ready(losses)

    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.trace.json.gz")), key=os.path.getmtime)
    if not paths:
        print("NO trace found")
        return 1
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    dev = defaultdict(float)
    cnt = defaultdict(int)
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("pid") == 3:
            dev[e["name"]] += e.get("dur", 0.0)
            cnt[e["name"]] += 1
    top = sorted(dev.items(), key=lambda kv: -kv[1])
    leaf_total = sum(v for k, v in top
                     if not k.startswith(("jit_", "while.")))
    print(f"leaf device total {leaf_total/1e3:.1f} ms")
    for k, v in top[:60]:
        print(f"  {v/1e3:9.2f} ms x{cnt[k]:<6d} {k[:110]}")
    # category rollup
    cat = defaultdict(float)
    for k, v in dev.items():
        if k.startswith(("jit_", "while.")):
            continue
        cat[k.split(".")[0]] += v
    print("\nby category:")
    for k, v in sorted(cat.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {v/1e3:9.2f} ms  {k}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
