"""Per-config throughput table (the BENCHMARKS.md round-2 methodology:
iteration-scanned chunks via Renderer.step_many — 16-iter chunks for the
primitive configs, 4-iter for mesh configs; best of `--reps` chunk epochs).

Usage: python tools/perf_table.py [--configs a,b,...] [--reps 3]
Prints one JSON line per config with ms/iter and M path-segments/s.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# name -> (scene file, chunk size)
CONFIGS = {
    "sphere": ("scenes/sphere.txt", 16),
    "cornell": ("scenes/cornell.txt", 16),
    "cornell_glass": ("scenes/cornell_glass.txt", 16),
    "cornell_dof": ("scenes/cornell_dof.txt", 16),
    "cornell_glossy": ("scenes/cornell_glossy.txt", 16),
    "blob": ("scenes/mesh.txt", 4),
    "textured_env_proc": ("scenes/textured_env_proc.txt", 4),
    "textured_env": ("scenes/textured_env.txt", 4),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default=",".join(CONFIGS))
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.render.integrator import Renderer

    for name in args.configs.split(","):
        scene_path, chunk = CONFIGS[name]
        path = os.path.join(ROOT, scene_path)
        if not os.path.exists(path):
            print(json.dumps({"config": name, "skipped": "missing scene"}),
                  flush=True)
            continue
        import numpy as np
        import jax.numpy as jnp

        def sync(x):
            # Value-transfer sync (round-4 fix): block_until_ready can
            # return early over the axon transport; a SCALAR reduction
            # transfer cannot lie and does not add the ~0.5 s full-image
            # tunnel transfer a np.asarray(accum) would. The round-3
            # table used block_until_ready — re-measure before comparing
            # (cornell moved 8.54 -> 7.81 ms, manylights 24.9 -> 12.6).
            np.asarray(jnp.sum(x))

        scene = load_scene(path)
        w, h = scene.camera.resolution
        depth = scene.settings.trace_depth
        r = Renderer(scene)
        r.CHUNK = chunk
        r.step_many(chunk)          # compile + warm
        sync(r.accum)
        dt = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            r.step_many(chunk)
            sync(r.accum)
            dt = min(dt, (time.perf_counter() - t0) / chunk)
        print(json.dumps({
            "config": name, "ms_per_iter": round(dt * 1000, 2),
            "msegs_per_s": round(w * h * depth / dt / 1e6, 1),
            "resolution": [w, h], "depth": depth, "chunk": chunk,
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
