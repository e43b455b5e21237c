"""Round-2 TPU batch #5: multi-stream latency-hiding A/B (streams 1/2/4)
on the micro populations and both mesh renderer configs.

Usage: python tools/exp_r2_batch5.py
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def micro():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from project3_cuda_path_tracer_tpu import load_scene
    import project3_cuda_path_tracer_tpu.ops.bvh8 as B8
    from tools.exp_traverse_micro import make_rays

    scene = load_scene(os.path.join(ROOT, "scenes/mesh.txt"))
    packed = scene.packed_meshes[0]
    rng = np.random.default_rng(0)
    for kind in ("bounce", "primary"):
        o, d = make_rays(kind, rng)
        qo = tuple(jnp.asarray(o[:, i]) for i in range(3))
        qd = tuple(jnp.asarray(d[:, i]) for i in range(3))
        for streams in (1, 2, 4):
            def run():
                out = B8.traverse_packets8(qo, qd, packed, sub=16,
                                           streams=streams)
                jax.block_until_ready(out)
                return out
            t0 = time.perf_counter()
            run()
            compile_s = time.perf_counter() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                run()
                best = min(best, time.perf_counter() - t0)
            print(json.dumps({"rays": kind, "streams": streams,
                              "ms": round(best * 1e3, 1),
                              "compile_s": round(compile_s, 1)}),
                  flush=True)


def bench_renderer(scene_path, iters=3, streams=1):
    import jax
    import project3_cuda_path_tracer_tpu.ops.bvh8 as B8
    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.render.integrator import Renderer

    jax.clear_caches()
    orig = bench_renderer._orig
    B8.traverse_packets8 = functools.partial(orig, streams=streams)
    try:
        scene = load_scene(scene_path)
        r = Renderer(scene)
        r.step()
        r.accum.block_until_ready()
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            r.step()
            r.accum.block_until_ready()
            best = min(best, time.perf_counter() - t0)
        img_mean = float(jax.numpy.mean(r.accum)) / r.iteration
        return {"scene": os.path.basename(scene_path), "streams": streams,
                "ms_per_iter": round(best * 1e3, 1),
                "img_mean": round(img_mean, 6)}
    finally:
        B8.traverse_packets8 = orig


def main():
    import jax
    print("backend:", jax.default_backend(), flush=True)
    import project3_cuda_path_tracer_tpu.ops.bvh8 as B8
    bench_renderer._orig = B8.traverse_packets8

    micro()
    for scene in ("scenes/mesh.txt", "scenes/textured_env_proc.txt",
                  "scenes/textured_env.txt"):
        for streams in (2, 4):
            print(json.dumps(bench_renderer(scene, 3, streams)), flush=True)


if __name__ == "__main__":
    main()
