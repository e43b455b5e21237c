"""Round-2 TPU batch #7: fused node row + roll-OR vote A/B.

Variants (semantically identical, CPU-verified bit-equal):
  base   — separate nodes_f/nodes_i loads, 3 packed-accumulator sums
  fused  — one all-f32 [128] node row load per interior pop
  rollor — lane OR-fold (7 pltpu.roll) + ONE reduction for the child vote
  both   — fused + rollor

Usage: python tools/exp_r2_batch7.py [--micro-only]
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

VARIANTS = {
    "base": dict(fused=False, reduce_mode="sum3"),
    "fused": dict(fused=True, reduce_mode="sum3"),
    "rollor": dict(fused=False, reduce_mode="rollor"),
    "both": dict(fused=True, reduce_mode="rollor"),
}


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
        ref = None
        for name, kw in VARIANTS.items():
            def run():
                out = B8.traverse_packets8(qo, qd, packed, sub=16, **kw)
                jax.block_until_ready(out)
                return out
            t0 = time.perf_counter()
            out = run()
            compile_s = time.perf_counter() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = run()
                best = min(best, time.perf_counter() - t0)
            if ref is None:
                ref = out
                same = True
            else:
                same = all(bool(jnp.array_equal(a, b))
                           for a, b in zip(ref, out))
            print(json.dumps({"rays": kind, "variant": name,
                              "ms": round(best * 1e3, 1),
                              "compile_s": round(compile_s, 1),
                              "identical": same}), flush=True)


def bench_renderer(scene_path, iters=3, variant="both"):
    import jax
    import project3_cuda_path_tracer_tpu.ops.bvh8 as B8
    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.render.integrator import Renderer

    jax.clear_caches()
    orig = bench_renderer._orig
    B8.traverse_packets8 = functools.partial(orig, **VARIANTS[variant])
    try:
        scene = load_scene(os.path.join(ROOT, scene_path))
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
        return {"scene": os.path.basename(scene_path), "variant": variant,
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
    if "--micro-only" in sys.argv:
        return
    for scene in ("scenes/mesh.txt", "scenes/textured_env_proc.txt"):
        for variant in ("base", "both"):
            print(json.dumps(bench_renderer(scene, 3, variant)), flush=True)


if __name__ == "__main__":
    main()
