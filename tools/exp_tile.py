"""Packet-shape A/B: pixel-tile swizzle size x packet size (sub).

A bvh8 packet is sub*128 consecutive paths; with the TxT tile swizzle
(TraceConfig.tile) those paths cover a (2048/T)xT... block of pixels:
  tile=32, sub=16 (HEAD): 2 adjacent 32x32 tiles = 64x32 block
  tile=64, sub=32:        one 64x64 square (fatter packet, tighter union
                          per ray: perimeter/area halves)
  tile=45-ish not possible (must divide w/h).
Usage: python tools/exp_tile.py [scene ...]
"""
from __future__ import annotations

import dataclasses
import functools
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

ITERS = 8


def bench(scene_path, tile, sub):
    import jax
    import jax.numpy as jnp
    import project3_cuda_path_tracer_tpu.ops.bvh8 as B8
    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.render.integrator import Renderer

    jax.clear_caches()
    orig_tr = bench._orig
    B8.traverse_packets8 = functools.partial(orig_tr, sub=sub)
    try:
        scene = load_scene(scene_path)
        r = Renderer(scene)
        if r.cfg.tile != tile:
            r.cfg = dataclasses.replace(r.cfg, tile=tile)
            r._baked_chunk = (r._build_baked_chunk()
                              if r._baked_chunk is not None else None)
            r.reset()
        t0 = time.perf_counter()
        r.step_many(1)
        r.accum.block_until_ready()
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            r.step_many(ITERS)
            r.accum.block_until_ready()
            best = min(best, (time.perf_counter() - t0) / ITERS)
        img_mean = float(jnp.mean(r.accum)) / r.iteration
        return {"scene": os.path.basename(scene_path), "tile": tile,
                "sub": sub, "ms_per_iter": round(best * 1e3, 1),
                "compile_s": round(compile_s, 1),
                "img_mean": round(img_mean, 6)}
    finally:
        B8.traverse_packets8 = orig_tr


def main():
    import jax
    print("backend:", jax.default_backend(), flush=True)
    import project3_cuda_path_tracer_tpu.ops.bvh8 as B8
    bench._orig = B8.traverse_packets8
    scenes = [a for a in sys.argv[1:] if not a.startswith("--")] \
        or ["scenes/mesh.txt"]
    for scene in scenes:
        for tile, sub in [(32, 16), (64, 32), (64, 16), (16, 16), (32, 32)]:
            print(json.dumps(bench(scene, tile, sub)), flush=True)


if __name__ == "__main__":
    main()
