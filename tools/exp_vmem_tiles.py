"""Measure TraceConfig.vmem_tiles on the scanned cornell forward (TPU).

The round-2 device profile showed the full-wavefront pipeline HBM-bound
(hot fusions at 660-674 GB/s, 82% of the v5e roof). Tiling the wavefront
so each tile's full bounce loop fits in VMEM should cut that traffic.

Usage: python tools/exp_vmem_tiles.py [tiles ...]   (default 0 4 8 16 25)
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
CHUNK = 20


def main():
    tiles = [int(a) for a in sys.argv[1:]] or [0, 4, 8, 16, 25]
    import numpy as np
    import jax
    import jax.numpy as jnp
    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.render import integrator as I

    print("backend:", jax.default_backend(), flush=True)
    s = load_scene(os.path.join(ROOT, "scenes/cornell.txt"))
    gt = tuple(int(t) for t in np.asarray(s.geoms.type))
    base = I.TraceConfig(width=W, height=H, trace_depth=DEPTH,
                         antialias=True, geom_types=gt, glossy=False,
                         sky=False)
    key = jax.random.PRNGKey(0)

    for t in tiles:
        cfg = dataclasses.replace(base, vmem_tiles=t)
        accum = jnp.zeros((H, W, 3), jnp.float32)

        def epoch(acc, r):
            return I.render_chunk(acc, s.materials, s.camera.flat(),
                                  s.geoms, s.meshes, s.textures,
                                  jax.random.fold_in(key, r), 0, cfg, CHUNK)

        t0 = time.perf_counter()
        accum = epoch(accum, 0)
        jax.block_until_ready(accum)
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for r in range(1, 4):
            t0 = time.perf_counter()
            accum = epoch(accum, r)
            jax.block_until_ready(accum)
            best = min(best, time.perf_counter() - t0)
        m = float(jnp.mean(accum)) / (4 * CHUNK)
        print(f"vmem_tiles={t:3d}: {best*1e3/CHUNK:6.2f} ms/iter "
              f"(compile {compile_s:.0f}s, mean {m:.4f})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
