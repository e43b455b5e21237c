"""Forward-step cost breakdown on cornell 800x800 (one TPU process).

The scanned forward render is 12.6 ms/step at 19% of the HBM roof and 4%
of the VPU roof — overhead-bound somewhere. Attribute it:
  depth sweep     — scanned renders at depth 1/2/4/8: slope = per-bounce
                    cost, intercept = raygen + gather + step overhead
  stage scans     — 20-step scans over just intersect / just shade /
                    just raygen with data-dependent carries (no constant
                    folding), each stage at the full 640k wavefront
  rng             — the per-bounce uniform draw (4x640k) in isolation

Usage: python tools/exp_fwd_breakdown.py
"""
from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

W = H = 800
N = W * H
SCAN = 20


def timeit(fn, iters=3):
    import jax
    jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.render import integrator as I
    from project3_cuda_path_tracer_tpu.ops import wavefront as wf
    from project3_cuda_path_tracer_tpu.ops.vec import V3

    print("backend:", jax.default_backend(), flush=True)
    s = load_scene(os.path.join(ROOT, "scenes/cornell.txt"))
    gt = tuple(int(t) for t in np.asarray(s.geoms.type))
    key = jax.random.PRNGKey(0)

    # --- depth sweep ------------------------------------------------------
    for depth in (1, 2, 4, 8):
        cfg = I.TraceConfig(width=W, height=H, trace_depth=depth,
                            antialias=True, geom_types=gt, glossy=False,
                            sky=False)

        @jax.jit
        def epoch(a, k):
            def one(acc, i):
                return I.render_step(acc, s.materials, s.camera.flat(),
                                     s.geoms, s.meshes, s.textures,
                                     jax.random.fold_in(k, i), cfg), None
            a, _ = jax.lax.scan(one, a, jnp.arange(SCAN))
            return a

        a0 = jnp.zeros((H, W, 3), jnp.float32)
        dt = timeit(lambda: epoch(a0, key)) / SCAN
        print(json.dumps({"stage": f"render_depth{depth}",
                          "ms": round(dt * 1e3, 2)}), flush=True)

    # --- stage scans ------------------------------------------------------
    o, d, times, pix = wf.generate_rays_planar(s.camera.flat(), W, H, key,
                                               antialias=True, tile=0)
    alive = jnp.ones((N,), bool)

    @jax.jit
    def isect_epoch(o, d):
        def one(carry, i):
            oo, dd = carry
            hit = wf.intersect_planar(oo, dd, times, s.geoms, s.meshes, gt,
                                      (), (), False, alive=alive)
            # data-dependent carry: bounce the origin off the hit point
            oo = hit.point
            dd = wf.reflect_planar(dd, hit.normal)
            return (oo, dd), None
        (oo, dd), _ = jax.lax.scan(one, (o, d), jnp.arange(SCAN))
        return oo.x

    dt = timeit(lambda: isect_epoch(o, d)) / SCAN
    print(json.dumps({"stage": "intersect_x20", "ms": round(dt * 1e3, 2)}),
          flush=True)

    hit0 = wf.intersect_planar(o, d, times, s.geoms, s.meshes, gt, (), (),
                               False, alive=alive)
    thr0 = V3(*(jnp.ones((N,), jnp.float32),) * 3)

    @jax.jit
    def shade_epoch(d0, k):
        def one(carry, i):
            dd, thr = carry
            u = jax.random.uniform(jax.random.fold_in(k, i), (4, N))
            out = wf.shade_planar(hit0, dd, thr, alive, s.materials,
                                  s.textures, u,
                                  last_bounce=jnp.zeros((N,), bool),
                                  glossy=False, sky=False)
            return (out.direction, out.throughput), None
        (dd, thr), _ = jax.lax.scan(one, (d0, thr0), jnp.arange(SCAN))
        return thr.x

    dt = timeit(lambda: shade_epoch(d, key)) / SCAN
    print(json.dumps({"stage": "shade_x20", "ms": round(dt * 1e3, 2)}),
          flush=True)

    @jax.jit
    def raygen_epoch(k):
        def one(acc, i):
            o, d, tm, pix = wf.generate_rays_planar(
                s.camera.flat(), W, H, jax.random.fold_in(k, i),
                antialias=True, tile=0)
            return acc + o.x + d.y + tm, None
        acc, _ = jax.lax.scan(one, jnp.zeros((N,), jnp.float32),
                              jnp.arange(SCAN))
        return acc

    dt = timeit(lambda: raygen_epoch(key)) / SCAN
    print(json.dumps({"stage": "raygen_x20", "ms": round(dt * 1e3, 2)}),
          flush=True)

    @jax.jit
    def rng_epoch(k):
        def one(acc, i):
            u = jax.random.uniform(jax.random.fold_in(k, i), (4, N))
            return acc + u.sum(0), None
        acc, _ = jax.lax.scan(one, jnp.zeros((N,), jnp.float32),
                              jnp.arange(SCAN))
        return acc

    # Renderer production keys are impl="rbg" (scene/types RenderSettings);
    # the train path and bench use threefry PRNGKey — attribute both.
    for impl in ("threefry2x32", "rbg"):
        kk = jax.random.key(0, impl=impl)
        dt = timeit(lambda: rng_epoch(kk)) / SCAN
        print(json.dumps({"stage": f"rng4_{impl}_x20",
                          "ms": round(dt * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
