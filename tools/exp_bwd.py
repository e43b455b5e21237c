"""Backward-pass cost experiments on cornell 800x800 d8 (one TPU process).

Times the fwd+bwd train step (inline, best-of-5) under remat variants:
  base    — jax.checkpoint(bounce), save nothing (round-1 production)
  hits    — checkpoint policy saves the intersection outputs, so the
            backward sweep recomputes only shading
  noremat — store all residuals (round-1 measured 3.3x worse; re-check)
  mat_only— gradient w.r.t. materials only (camera detached): how much of
            the cost is the camera path
Plus the forward-only step for the ratio.

Usage: python tools/exp_bwd.py
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

W = H = 800
D = 8


def timeit(fn, *args, iters=5):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.render import integrator as I
    from project3_cuda_path_tracer_tpu.models.inverse import (
        RenderParams, mse_loss)

    print("backend:", jax.default_backend(), flush=True)
    s = load_scene(os.path.join(ROOT, "scenes/cornell.txt"))
    gt = tuple(int(t) for t in np.asarray(s.geoms.type))
    base_cfg = I.TraceConfig(width=W, height=H, trace_depth=D,
                             antialias=True, geom_types=gt,
                             glossy=False, sky=False)
    n_seg = W * H * D
    key = jax.random.PRNGKey(0)
    target = jnp.zeros((H, W, 3), jnp.float32)
    params = RenderParams(materials=s.materials, cam=s.camera.flat())

    accum = jnp.zeros((H, W, 3), jnp.float32)
    fwd = jax.jit(lambda k: I.render_step(
        jnp.zeros((H, W, 3), jnp.float32), s.materials, s.camera.flat(),
        s.geoms, s.meshes, s.textures, k, base_cfg))
    dt = timeit(fwd, key)
    print(json.dumps({"variant": "forward_only",
                      "ms": round(dt * 1e3, 2),
                      "msegs_s": round(n_seg / dt / 1e6, 1)}), flush=True)

    def grad_fn(cfg, mat_only=False):
        def loss(p, k):
            if mat_only:
                p = RenderParams(materials=p.materials,
                                 cam=jax.tree_util.tree_map(
                                     jax.lax.stop_gradient, p.cam))
            return mse_loss(p, s.geoms, s.meshes, s.textures, k, cfg, target)
        return jax.jit(jax.value_and_grad(loss))

    variants = [
        ("base", base_cfg, False),
        ("hits", dataclasses.replace(base_cfg, remat_save="hits"), False),
        ("noremat", dataclasses.replace(base_cfg, remat=False), False),
        ("mat_only", base_cfg, True),
        ("mat_only_hits",
         dataclasses.replace(base_cfg, remat_save="hits"), True),
    ]
    for name, cfg, mat_only in variants:
        try:
            f = grad_fn(cfg, mat_only)
            dt = timeit(f, params, key)
            print(json.dumps({"variant": name, "ms": round(dt * 1e3, 2),
                              "msegs_s": round(n_seg / dt / 1e6, 1)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            print(json.dumps({"variant": name,
                              "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
