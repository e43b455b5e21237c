"""Probe: does raising --xla_tpu_scoped_vmem_limit_kib (bigger fusions,
fewer HBM boundaries) move the scanned cornell forward?

The round-2 trace shows the top fusions at 660-674 GB/s HBM (82% of the
v5e roof) — HBM-bound on inter-fusion wavefront traffic.

Usage: XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=NNN python tools/exp_vmem_flags.py
"""
from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

W = H = 800
DEPTH = 8
CHUNK = 20


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.render import integrator as I

    print("backend:", jax.default_backend(),
          "XLA_FLAGS:", os.environ.get("XLA_FLAGS", ""), flush=True)
    s = load_scene(os.path.join(ROOT, "scenes/cornell.txt"))
    gt = tuple(int(t) for t in np.asarray(s.geoms.type))
    cfg = I.TraceConfig(width=W, height=H, trace_depth=DEPTH,
                        antialias=True, geom_types=gt, glossy=False,
                        sky=False)
    accum = jnp.zeros((H, W, 3), jnp.float32)
    key = jax.random.PRNGKey(0)

    def epoch(acc, r):
        return I.render_chunk(acc, s.materials, s.camera.flat(), s.geoms,
                              s.meshes, s.textures,
                              jax.random.fold_in(key, r), 0, cfg, CHUNK)

    accum = epoch(accum, 0)
    jax.block_until_ready(accum)
    best = float("inf")
    for r in range(1, 4):
        t0 = time.perf_counter()
        accum = epoch(accum, r)
        jax.block_until_ready(accum)
        best = min(best, time.perf_counter() - t0)
    print(f"ms/iter: {best*1e3/CHUNK:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
