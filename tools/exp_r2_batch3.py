"""Round-2 TPU batch #3: alive-masked traversal A/B (leaf-15 + ordered
baseline), fwd+bwd with the remat_save="hits" default, and the roofline
accounting — one TPU process.

Usage: python tools/exp_r2_batch3.py
"""
from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def bench_renderer(scene_path, iters=3, mask_alive=True, depth=None):
    import jax
    import project3_cuda_path_tracer_tpu.ops.wavefront as WF
    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.render.integrator import Renderer

    jax.clear_caches()
    orig = bench_renderer._orig
    if not mask_alive:
        WF.intersect_planar = (
            lambda *a, alive=None, **kw: orig(*a, alive=None, **kw))
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
        return {"scene": os.path.basename(scene_path),
                "mask_alive": mask_alive,
                "ms_per_iter": round(best * 1e3, 1),
                "compile_s": round(compile_s, 1),
                "img_mean": round(img_mean, 6)}
    finally:
        WF.intersect_planar = orig


def main():
    import jax
    print("backend:", jax.default_backend(), flush=True)
    import project3_cuda_path_tracer_tpu.ops.wavefront as WF
    bench_renderer._orig = WF.intersect_planar

    for scene in ("scenes/mesh.txt", "scenes/textured_env_proc.txt"):
        for mask in (True, False):
            print(json.dumps(bench_renderer(scene, 3, mask)), flush=True)
    # cornell sanity (primitive path — masking shouldn't change anything)
    print(json.dumps(bench_renderer("scenes/cornell.txt", 5, True)),
          flush=True)
    # the REAL atlas-texture + HDR-envmap scene (VERDICT weak item 6):
    # establish its ms/iter at 2048^2 alongside the procedural variant
    try:
        print(json.dumps(bench_renderer("scenes/textured_env.txt", 3, True)),
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"scene": "textured_env.txt",
                          "error": str(e)[-300:]}), flush=True)

    jax.clear_caches()
    import tools.roofline as R
    R.main()


if __name__ == "__main__":
    main()
