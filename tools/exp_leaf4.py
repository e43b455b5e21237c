"""Sweep the BINARY-BUILDER leaf limit below 8 + re-sweep packet size.

Round-2 found WIDE_LEAF_K 15 -> 9 -> 8 monotonically faster on the blob
(431 -> 400 -> 390 ms/iter): the bvh8 kernel wastes its per-pop
Moller-Trumbote unroll on lanes that don't want the leaf, so smaller
leaves win. 8 is the binary SAH builder's leaf max (ops/intersect.LEAF_K)
— going lower needs the binary tree REBUILT with a smaller limit, which
this tool does by monkeypatching scene.bvh.build_bvh before load_scene.
The packet-size (sub) optimum was last swept before the leaf-8 and
ordered-pop changes; re-sweep it at HEAD too.

Measurement: scanned chunks (Renderer.step_many) — immune to the
dispatch tax (BENCHMARKS.md).

Usage: python tools/exp_leaf4.py [scene ...]
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


def bench(scene_path, build_leaf, wide_leaf, sub):
    import jax
    import jax.numpy as jnp
    import project3_cuda_path_tracer_tpu.scene.bvh as SB
    import project3_cuda_path_tracer_tpu.ops.bvh8 as B8
    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.render.integrator import Renderer

    jax.clear_caches()
    orig_build, orig_k, orig_tr = bench._orig
    SB.build_bvh = functools.partial(orig_build, leaf_k=build_leaf)
    B8.WIDE_LEAF_K = wide_leaf           # pack-time fat-leaf merge limit
    B8.traverse_packets8 = functools.partial(
        orig_tr, leaf_k=wide_leaf, sub=sub)
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
        return {"scene": os.path.basename(scene_path),
                "build_leaf": build_leaf, "wide_leaf": wide_leaf,
                "sub": sub, "ms_per_iter": round(best * 1e3, 1),
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
    confirm = "--confirm" in args   # just HEAD vs the mesh.txt optimum
    scenes = [a for a in args if not a.startswith("--")] \
        or ["scenes/mesh.txt"]
    sweeps = ([(8, 8, 16), (4, 4, 16)] if confirm else [
        (8, 8, 16),   # HEAD baseline
        (4, 4, 16),   # smaller leaves, same packet
        (4, 4, 8),    # smaller leaves, smaller packet
        (2, 2, 16),   # extreme: near-single-tri leaves
        (8, 8, 8),    # packet re-sweep at HEAD tree shape
        (4, 4, 32),
    ])
    for scene in scenes:
        for build_leaf, wide_leaf, sub in sweeps:
            print(json.dumps(bench(scene, build_leaf, wide_leaf, sub)),
                  flush=True)


if __name__ == "__main__":
    main()
