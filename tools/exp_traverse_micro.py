"""Microbenchmark of the BVH8 packet traversal kernel (direct calls, so the
static (ordered, sub) args force proper recompiles — the full-renderer A/B
is cache-confounded).

Three ray populations over the blob mesh (object space):
  primary    — one origin outside the mesh, a coherent frustum of dirs
  bounce     — origins on a shell around the mesh, cosine-ish outward dirs
               with partial per-row coherence (tile-swizzled wavefront-like)
  random     — fully incoherent origins+dirs (adversarial)

Reports ms (best of 3) and mean/max per-packet pop counts.
Usage: python tools/exp_traverse_micro.py
"""
from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N = 1 << 20


def make_rays(kind, rng):
    import numpy as np
    if kind == "primary":
        o = np.tile(np.array([0.0, 0.0, 4.0], np.float32), (N, 1))
        # frustum toward the origin with a small jittered spread, scan order
        side = int(np.sqrt(N))
        xs, ys = np.meshgrid(np.linspace(-0.4, 0.4, side),
                             np.linspace(-0.4, 0.4, side))
        d = np.stack([xs.ravel(), ys.ravel(), -np.ones(N)], 1)
    elif kind == "bounce":
        # hit points of adjacent pixels are spatially close: walk a smooth
        # path on the shell so consecutive rays have nearby origins, but
        # directions are per-ray random hemispheres (diffuse scatter)
        t = np.linspace(0, 40 * np.pi, N)
        o = np.stack([np.cos(t), np.sin(2.1 * t) * 0.6, np.sin(t)], 1)
        o *= 1.3
        d = rng.normal(size=(N, 3))
        out = (d * o).sum(1) < 0
        d[out] = -d[out]          # outward-ish hemisphere... inward actually
        d = -d                    # point back toward the mesh
    else:
        o = rng.uniform(-2, 2, size=(N, 3))
        d = rng.normal(size=(N, 3))
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    return o.astype(np.float32), d.astype(np.float32)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from project3_cuda_path_tracer_tpu import load_scene
    import project3_cuda_path_tracer_tpu.ops.bvh8 as B8

    print("backend:", jax.default_backend(), flush=True)
    scene = load_scene(os.path.join(ROOT, "scenes/mesh.txt"))
    packed = scene.packed_meshes[0]
    rng = np.random.default_rng(0)

    for kind in ("bounce", "random", "primary"):
        o, d = make_rays(kind, rng)
        qo = tuple(jnp.asarray(o[:, i]) for i in range(3))
        qd = tuple(jnp.asarray(d[:, i]) for i in range(3))
        for ordered in ("centroid", "dir", False):
            for sub in (16,):
                def run():
                    out = B8.traverse_packets8(
                        qo, qd, packed, sub=sub, ordered=ordered,
                        return_steps=True)
                    jax.block_until_ready(out)
                    return out
                out = run()   # compile
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    out = run()
                    best = min(best, time.perf_counter() - t0)
                steps = np.asarray(out[5])
                t = np.asarray(out[0])
                print(json.dumps({
                    "rays": kind, "ordered": str(ordered), "sub": sub,
                    "ms": round(best * 1e3, 1),
                    "mrays_s": round(N / best / 1e6, 2),
                    "steps_mean": round(float(steps.mean()), 1),
                    "steps_max": int(steps.max()),
                    "hit_frac": round(float((t < B8.BIG).mean()), 3),
                }), flush=True)


if __name__ == "__main__":
    main()
