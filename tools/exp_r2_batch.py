"""Round-2 TPU batch #2: leaf-31 + ordered traversal on the full renderer,
scanned-epoch backward variants, and the texture-gather primitive.

jax.clear_caches() between renderer variants: the Renderer's jit cache
ignores monkeypatched traversal defaults (cache keys don't include them).

Usage: python tools/exp_r2_batch.py
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


def bench_renderer(scene_path, iters, **tr_kw):
    import jax
    import project3_cuda_path_tracer_tpu.ops.bvh8 as PB8
    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.render.integrator import Renderer

    jax.clear_caches()
    orig = bench_renderer._orig
    PB8.traverse_packets8 = functools.partial(orig, **tr_kw)
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
        return {"scene": os.path.basename(scene_path), **tr_kw,
                "ms_per_iter": round(best * 1e3, 1),
                "compile_s": round(compile_s, 1),
                "img_mean": round(img_mean, 6)}
    finally:
        PB8.traverse_packets8 = orig


def bench_scanned_bwd():
    """Scanned 20-step epochs (the bench.py form) for remat variants."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.render.integrator import TraceConfig
    from project3_cuda_path_tracer_tpu.models.inverse import (
        RenderParams, make_train_scan)

    W = H = 800
    D = 8
    STEPS = 20
    scene = load_scene(os.path.join(ROOT, "scenes/cornell.txt"))
    gt = tuple(int(t) for t in np.asarray(scene.geoms.type))
    base = TraceConfig(width=W, height=H, trace_depth=D, antialias=True,
                       geom_types=gt, glossy=False, sky=False)
    for name, cfg in (("base", base),
                      ("hits", dataclasses.replace(base, remat_save="hits"))):
        jax.clear_caches()
        opt, run = make_train_scan(scene.geoms, scene.meshes, scene.textures,
                                   cfg, num_steps=STEPS)
        params = jax.tree_util.tree_map(
            jnp.array, RenderParams(materials=scene.materials,
                                    cam=scene.camera.flat()))
        opt_state = opt.init(params)
        target = jnp.zeros((H, W, 3), jnp.float32)
        key = jax.random.PRNGKey(0)
        params, opt_state, losses = run(params, opt_state, key, target)
        jax.block_until_ready(losses)
        dt = float("inf")
        for r in range(1, 4):
            t0 = time.perf_counter()
            params, opt_state, losses = run(
                params, opt_state, jax.random.fold_in(key, r), target)
            jax.block_until_ready(losses)
            dt = min(dt, time.perf_counter() - t0)
        print(json.dumps({
            "variant": f"scanned_{name}",
            "ms_per_step": round(dt * 1e3 / STEPS, 2),
            "msegs_s": round(STEPS * W * H * D / dt / 1e6, 1),
        }), flush=True)


def main():
    import jax
    print("backend:", jax.default_backend(), flush=True)
    import project3_cuda_path_tracer_tpu.ops.bvh8 as PB8
    bench_renderer._orig = PB8.traverse_packets8

    for scene in ("scenes/mesh.txt", "scenes/textured_env_proc.txt"):
        for kw in ({"sub": 16}, {"sub": 32}, {"sub": 16, "ordered": False}):
            print(json.dumps(bench_renderer(scene, 3, **kw)), flush=True)

    bench_scanned_bwd()

    import subprocess
    # gather experiment shares the process? separate module, same process:
    sys.argv = ["exp_gather.py"]
    import tools.exp_gather as G
    G.main()


if __name__ == "__main__":
    main()
