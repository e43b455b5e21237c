"""Round-2 BVH experiment batch: ordered (near-to-far) child pops A/B.

One long-lived TPU process (the axon attach costs ~40 s; never run two).
Times full Renderer iterations on the two mesh-bound BASELINE configs with
the ordered traversal on/off (and optional sub sweep).

Usage: python tools/exp_bvh_order.py [--quick]
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def bench(scene_path, iters, ordered, sub, depth=None):
    import jax
    import project3_cuda_path_tracer_tpu.ops.bvh8 as PB8
    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.render.integrator import Renderer

    orig = bench._orig
    PB8.traverse_packets8 = functools.partial(orig, ordered=ordered, sub=sub)
    try:
        scene = load_scene(scene_path)
        if depth:
            scene.settings.trace_depth = depth
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
        return {"scene": os.path.basename(scene_path), "ordered": ordered,
                "sub": sub, "ms_per_iter": round(best * 1e3, 1),
                "compile_s": round(compile_s, 1),
                "img_mean": round(img_mean, 6)}
    finally:
        PB8.traverse_packets8 = orig


def main():
    quick = "--quick" in sys.argv
    import jax
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    import project3_cuda_path_tracer_tpu.ops.bvh8 as PB8
    bench._orig = PB8.traverse_packets8

    runs = [
        ("scenes/mesh.txt", True, 16),
        ("scenes/mesh.txt", False, 16),
        ("scenes/textured_env_proc.txt", True, 16),
        ("scenes/textured_env_proc.txt", False, 16),
    ]
    if not quick:
        runs += [
            ("scenes/mesh.txt", True, 32),
            ("scenes/textured_env_proc.txt", True, 32),
        ]
    for path, ordered, sub in runs:
        res = bench(path, iters=3 if not quick else 2, ordered=ordered,
                    sub=sub)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
