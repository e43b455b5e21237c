"""Leaf-width A/B on the full renderer (one TPU process).

WIDE_LEAF_K controls the fat-leaf merge at PACK time (tree shape) and the
Moller-Trumbore unroll at traversal time; batch #1 changed it 15->31
together with ordered pops and measured blob 790 ms vs round-1's 715 —
this isolates the leaf factor. jax.clear_caches() between variants (the
Renderer jit cache ignores the monkeypatched module constant).

Usage: python tools/exp_leafk.py
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def bench(scene_path, leaf_k, ordered, iters=3):
    import jax
    import project3_cuda_path_tracer_tpu.ops.bvh8 as B8
    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.render.integrator import Renderer

    jax.clear_caches()
    orig_k, orig_tr = bench._orig
    B8.WIDE_LEAF_K = leaf_k
    B8.traverse_packets8 = functools.partial(
        orig_tr, leaf_k=leaf_k, ordered=ordered)
    try:
        scene = load_scene(scene_path)
        r = Renderer(scene)
        t0 = time.perf_counter()
        r.step()
        r.accum.block_until_ready()
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            r.step()
            r.accum.block_until_ready()
            best = min(best, time.perf_counter() - t0)
        img_mean = float(jax.numpy.mean(r.accum)) / r.iteration
        return {"scene": os.path.basename(scene_path), "leaf_k": leaf_k,
                "ordered": ordered, "ms_per_iter": round(best * 1e3, 1),
                "compile_s": round(compile_s, 1),
                "img_mean": round(img_mean, 6)}
    finally:
        B8.WIDE_LEAF_K, B8.traverse_packets8 = orig_k, orig_tr


def main():
    import jax
    print("backend:", jax.default_backend(), flush=True)
    import project3_cuda_path_tracer_tpu.ops.bvh8 as B8
    bench._orig = (B8.WIDE_LEAF_K, B8.traverse_packets8)

    for scene in ("scenes/mesh.txt", "scenes/textured_env_proc.txt"):
        for leaf_k in (15, 31):
            for ordered in (True, False):
                print(json.dumps(bench(scene, leaf_k, ordered)), flush=True)


if __name__ == "__main__":
    main()
