"""Round-2 TPU batch #4: fixed centroid vote micro A/B, renderer ordering
A/B (alive-mask on), packed-texture textured_env, scanned roofline.

Usage: python tools/exp_r2_batch4.py
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
    for kind in ("bounce", "primary", "random"):
        o, d = make_rays(kind, rng)
        qo = tuple(jnp.asarray(o[:, i]) for i in range(3))
        qd = tuple(jnp.asarray(d[:, i]) for i in range(3))
        for ordered in ("centroid",):
            def run():
                out = B8.traverse_packets8(qo, qd, packed, sub=16,
                                           ordered=ordered,
                                           return_steps=True)
                jax.block_until_ready(out)
                return out
            out = run()
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = run()
                best = min(best, time.perf_counter() - t0)
            steps = np.asarray(out[5])
            print(json.dumps({
                "rays": kind, "ordered": ordered,
                "ms": round(best * 1e3, 1),
                "steps_mean": round(float(steps.mean()), 1),
            }), flush=True)


def bench_renderer(scene_path, iters=3, ordered=None):
    import jax
    import project3_cuda_path_tracer_tpu.ops.bvh8 as B8
    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.render.integrator import Renderer

    jax.clear_caches()
    orig = bench_renderer._orig
    if ordered is not None:
        B8.traverse_packets8 = functools.partial(orig, ordered=ordered)
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
        return {"scene": os.path.basename(scene_path),
                "ordered": str(ordered),
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

    for scene in ("scenes/mesh.txt", "scenes/textured_env_proc.txt"):
        for ordered in ("centroid", "dir"):
            print(json.dumps(bench_renderer(scene, 3, ordered)), flush=True)

    # real atlas+HDR scene, now with packed u32 texel planes
    print(json.dumps(bench_renderer("scenes/textured_env.txt", 3,
                                    "centroid")), flush=True)

    jax.clear_caches()
    import tools.roofline as R
    R.main()


if __name__ == "__main__":
    main()
