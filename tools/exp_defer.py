"""Round-3 A/B: deferred-attribute traversal + slab-compare fold.

Two kernel changes land together in round 3 (ops/bvh8.py):
  1. slab fold — the 4-term per-child lane predicate becomes 2 compares
     + 1 and (exact semantics; always on);
  2. defer_attrs — the leaf phase stops interpolating normals/uv per
     candidate triangle inside the Mosaic loop (pure wasted vector work:
     only the winner matters); the kernel carries (t, bu, bv, tri) and
     one XLA row gather fetches the winner's attributes afterwards.
This tool measures each scene under defer on/off, and re-sweeps the
leaf size under defer (cheaper leaf pops may shift the optimum back up:
bigger leaves = fewer interior pops).

Measurement: scanned chunks (Renderer.step_many) — immune to the
dispatch tax (BENCHMARKS.md).

Usage: python tools/exp_defer.py [--sweep] [scene ...]
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

ITERS = 8


def bench(scene_path, defer, build_leaf=4, wide_leaf=4, sub=16):
    import jax
    import jax.numpy as jnp
    import project3_cuda_path_tracer_tpu.scene.bvh as SB
    import project3_cuda_path_tracer_tpu.ops.bvh8 as B8
    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.render.integrator import Renderer

    jax.clear_caches()
    orig_build, orig_k, orig_tr = bench._orig
    SB.build_bvh = functools.partial(orig_build, leaf_k=build_leaf)
    B8.WIDE_LEAF_K = wide_leaf
    B8.traverse_packets8 = functools.partial(
        orig_tr, leaf_k=wide_leaf, sub=sub, defer_attrs=defer)
    try:
        scene = load_scene(scene_path)
        r = Renderer(scene)
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
        return {"scene": os.path.basename(scene_path), "defer": defer,
                "leaf": wide_leaf, "sub": sub,
                "ms_per_iter": round(best * 1e3, 1),
                "compile_s": round(compile_s, 1),
                "img_mean": round(img_mean, 6)}
    finally:
        SB.build_bvh = orig_build
        B8.WIDE_LEAF_K, B8.traverse_packets8 = orig_k, orig_tr


def main():
    import jax
    print("backend:", jax.default_backend(), flush=True)
    import project3_cuda_path_tracer_tpu.scene.bvh as SB
    import project3_cuda_path_tracer_tpu.ops.bvh8 as B8
    bench._orig = (SB.build_bvh, B8.WIDE_LEAF_K, B8.traverse_packets8)

    args = sys.argv[1:]
    sweep = "--sweep" in args
    scenes = [a for a in args if not a.startswith("--")] \
        or ["scenes/mesh.txt"]
    runs = [dict(defer=False), dict(defer=True)]
    if sweep:
        runs += [dict(defer=True, build_leaf=8, wide_leaf=8),
                 dict(defer=True, build_leaf=6, wide_leaf=6),
                 dict(defer=True, sub=8),
                 dict(defer=True, sub=32)]
    for scene in scenes:
        for kw in runs:
            print(json.dumps(bench(scene, **kw)), flush=True)


if __name__ == "__main__":
    main()
