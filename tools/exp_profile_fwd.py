"""Profile the scanned forward cornell render and attribute device time.

Captures a jax.profiler trace around one render_chunk epoch on the TPU,
then parses the emitted chrome-trace (trace.json.gz) and aggregates event
durations by op name, printing the top entries. Goal: attribute the
1.37-vs-0.67 ms/bounce gap (BENCHMARKS.md roofline section) to specific
XLA fusions / layout ops.

Usage: python tools/exp_profile_fwd.py [logdir]
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
CHUNK = 20


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.render import integrator as I

    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fwd_trace"
    print("backend:", jax.default_backend(), flush=True)
    s = load_scene(os.path.join(ROOT, "scenes/cornell.txt"))
    gt = tuple(int(t) for t in np.asarray(s.geoms.type))
    cfg = I.TraceConfig(width=W, height=H, trace_depth=DEPTH,
                        antialias=True, geom_types=gt, glossy=False,
                        sky=False)
    accum = jnp.zeros((H, W, 3), jnp.float32)
    key = jax.random.PRNGKey(0)

    def epoch(acc, r):
        return I.render_chunk(acc, s.materials, s.camera.flat(), s.geoms,
                              s.meshes, s.textures,
                              jax.random.fold_in(key, r), 0, cfg, CHUNK)

    accum = epoch(accum, 0)
    jax.block_until_ready(accum)
    t0 = time.perf_counter()
    accum = epoch(accum, 1)
    jax.block_until_ready(accum)
    wall = time.perf_counter() - t0
    print(f"epoch wall (untraced): {wall*1e3:.1f} ms "
          f"({wall*1e3/CHUNK:.2f} ms/iter)", flush=True)

    with jax.profiler.trace(logdir):
        accum = epoch(accum, 2)
        jax.block_until_ready(accum)
    print("trace captured to", logdir, flush=True)

    # ---- parse -----------------------------------------------------------
    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.trace.json.gz")), key=os.path.getmtime)
    if not paths:
        print("NO trace.json.gz found; files present:")
        for p in glob.glob(os.path.join(logdir, "**/*"), recursive=True):
            print("  ", p)
        return 1
    path = paths[-1]
    print("parsing", path, flush=True)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # pid -> process name, to split device vs host threads
    pnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")
    by_pid = defaultdict(lambda: defaultdict(float))
    counts = defaultdict(lambda: defaultdict(int))
    for e in events:
        if e.get("ph") != "X":
            continue
        pid = e.get("pid")
        name = e.get("name", "?")
        by_pid[pid][name] += e.get("dur", 0.0)
        counts[pid][name] += 1
    for pid, table in by_pid.items():
        label = pnames.get(pid, str(pid))
        total = sum(table.values())
        print(f"\n== pid {pid} ({label}) total {total/1e3:.2f} ms over "
              f"{sum(counts[pid].values())} events ==")
        for name, dur in sorted(table.items(), key=lambda kv: -kv[1])[:45]:
            print(f"  {dur/1e3:9.2f} ms  x{counts[pid][name]:<6d} {name[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
