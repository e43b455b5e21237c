"""Round-2 TPU batch #6: push-decode precompute A/B.

nodes_i cols 0-7 now hold pre-encoded stack entries (build-time), and
empty slots hold NaN boxes, removing 2 scalar loads + compare + select +
valid check per child per pop. Baselines (batch4, ordered=centroid):
  micro bounce 1023.7 ms, primary 100.3 ms
  mesh.txt 555.9 ms/iter, textured_env_proc.txt 618.4 ms/iter

Usage: python tools/exp_r2_batch6.py
"""
from __future__ import annotations

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

        def run():
            out = B8.traverse_packets8(qo, qd, packed, sub=16)
            jax.block_until_ready(out)
            return out

        t0 = time.perf_counter()
        ref = run()
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        t_sum = float(jnp.sum(jnp.where(jnp.isfinite(ref[0]), ref[0], 0.0)))
        print(json.dumps({"rays": kind, "ms": round(best * 1e3, 1),
                          "compile_s": round(compile_s, 1),
                          "t_sum": round(t_sum, 2)}), flush=True)


def bench_renderer(scene_path, iters=3):
    import numpy as np
    import jax
    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.render.integrator import Renderer

    scene = load_scene(os.path.join(ROOT, scene_path))
    r = Renderer(scene)
    t0 = time.perf_counter()
    r.step()
    jax.block_until_ready(r.accum)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        r.step()
        jax.block_until_ready(r.accum)
        best = min(best, time.perf_counter() - t0)
    img = np.asarray(r.accum) / r.iteration
    print(json.dumps({"scene": os.path.basename(scene_path),
                      "ms_per_iter": round(best * 1e3, 1),
                      "compile_s": round(compile_s, 1),
                      "img_mean": round(float(img.mean()), 6)}), flush=True)


def main():
    import jax
    print("backend:", jax.default_backend(), flush=True)
    micro()
    for sc in ("scenes/mesh.txt", "scenes/textured_env_proc.txt"):
        bench_renderer(sc)


if __name__ == "__main__":
    main()
