"""Scaling-efficiency harness (BASELINE target: >=80% linear rays/s scaling
across chips/hosts).

Runs the sharded renderer over submeshes of 1..K devices and reports
rays/s + efficiency vs linear. On real multi-chip hardware this measures
ICI scaling; on the virtual CPU mesh it validates the harness and the SPMD
program only (all "devices" share one socket, so efficiency numbers are
not meaningful there — the harness prints the backend so the reader knows).

Usage: python tools/scaling_bench.py [scene] [--spp N] [--res N]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?", default="scenes/cornell.txt")
    ap.add_argument("--spp", type=int, default=10)
    ap.add_argument("--res", type=int, default=0)
    args = ap.parse_args()

    import jax
    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.parallel.sharding import (
        make_mesh, ShardedRenderer)

    scene = load_scene(args.scene)
    if args.res:
        scene.camera.resolution = (args.res, args.res)
        scene.camera.derive()
    w, h = scene.camera.resolution
    depth = scene.settings.trace_depth

    total = len(jax.devices())
    sizes = [k for k in (1, 2, 4, 8, 16, 32) if k <= total and h % k == 0]

    base_rate = None
    for k in sizes:
        r = ShardedRenderer(scene, mesh=make_mesh(num_devices=k))
        r.step()
        r.accum.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(args.spp):
            r.step()
        r.accum.block_until_ready()
        dt = (time.perf_counter() - t0) / args.spp
        rate = w * h * depth / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * k)
        print(json.dumps({
            "devices": k, "backend": jax.default_backend(),
            "ms_per_iter": round(dt * 1000, 2),
            "msegs_per_s": round(rate / 1e6, 1),
            "scaling_efficiency_vs_1dev": round(eff, 3),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
