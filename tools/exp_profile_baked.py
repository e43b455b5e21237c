"""Device-trace the BAKED forward cornell render (post scene-baking) and
aggregate per-fusion device time — the successor attribution to
tools/exp_profile_fwd.py, whose op mix the baking changed.

Usage: python tools/exp_profile_baked.py [logdir]
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

CHUNK = 20


def main():
    import numpy as np
    import jax
    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.render.integrator import Renderer

    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/baked_trace"
    print("backend:", jax.default_backend(), flush=True)
    s = load_scene(os.path.join(ROOT, "scenes/cornell.txt"))
    r = Renderer(s)  # bake_scene default on

    r.step_many(CHUNK)
    np.asarray(r.accum)
    t0 = time.perf_counter()
    r.step_many(CHUNK)
    np.asarray(r.accum)
    wall = time.perf_counter() - t0
    print(f"epoch wall: {wall*1e3:.1f} ms ({wall*1e3/CHUNK:.2f} ms/iter)",
          flush=True)

    with jax.profiler.trace(logdir):
        r.step_many(CHUNK)
        np.asarray(r.accum)

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
    leaf = sum(v for k, v in top if not k.startswith(("jit_", "while.")))
    print(f"leaf device total {leaf/1e3:.1f} ms")
    for k, v in top[:40]:
        print(f"  {v/1e3:9.2f} ms x{cnt[k]:<6d} {k[:110]}")
    cat = defaultdict(float)
    for k, v in dev.items():
        if not k.startswith(("jit_", "while.")):
            cat[k.split(".")[0]] += v
    print("\nby category:")
    for k, v in sorted(cat.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {v/1e3:9.2f} ms  {k}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
