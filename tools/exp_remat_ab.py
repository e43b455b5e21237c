"""A/B the bounce-loop remat policy on the scanned train step (TPU).

The round-2 trace showed the `save_only_these_names("hit")` tagging
lowers to f32->f32 identity reduce-precision barriers (one full-array
pass per saved plane per bounce, ~5% of the step) plus residual
dynamic-update-slice stacking (~15%). Re-measure all three policies with
the current kernels.

Usage: python tools/exp_remat_ab.py
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

W = H = 800
DEPTH = 8
STEPS = 20


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.render.integrator import TraceConfig
    from project3_cuda_path_tracer_tpu.models.inverse import (
        RenderParams, make_train_scan)

    print("backend:", jax.default_backend(), flush=True)
    scene = load_scene(os.path.join(ROOT, "scenes/cornell.txt"))
    gt = tuple(int(t) for t in np.asarray(scene.geoms.type))
    base = TraceConfig(width=W, height=H, trace_depth=DEPTH,
                       antialias=True, geom_types=gt, glossy=False,
                       sky=False)
    key = jax.random.PRNGKey(0)
    target = jnp.zeros((H, W, 3), jnp.float32)

    for label, kw in [("remat+hits (default)", dict(remat=True,
                                                    remat_save="hits")),
                      ("remat, save nothing", dict(remat=True,
                                                   remat_save=None)),
                      ("no remat", dict(remat=False, remat_save=None))]:
        cfg = dataclasses.replace(base, **kw)
        opt, run = make_train_scan(scene.geoms, scene.meshes,
                                   scene.textures, cfg, num_steps=STEPS)
        params = jax.tree_util.tree_map(
            jnp.array, RenderParams(materials=scene.materials,
                                    cam=scene.camera.flat()))
        opt_state = opt.init(params)
        try:
            params, opt_state, losses = run(params, opt_state, key, target)
            jax.block_until_ready(losses)
        except Exception as e:  # e.g. OOM without remat
            print(f"{label}: FAILED ({type(e).__name__})", flush=True)
            continue
        best = float("inf")
        for r in range(1, 4):
            t0 = time.perf_counter()
            params, opt_state, losses = run(params, opt_state,
                                            jax.random.fold_in(key, r),
                                            target)
            jax.block_until_ready(losses)
            best = min(best, time.perf_counter() - t0)
        ms = best * 1e3 / STEPS
        segs = W * H * DEPTH / (best / STEPS)
        print(f"{label}: {ms:.2f} ms/step ({segs/1e6:.1f} M segs/s)",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
