"""Probe: bake the scene tables (geoms/materials/textures) into the
program as CONSTANTS (closure-captured numpy) instead of traced jit
arguments, so XLA's algebraic simplifier can fold the transform zeros
and material constants through the whole intersect/shade pipeline.

Usage: python tools/exp_bake_scene.py [scene]
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

    scene_path = sys.argv[1] if len(sys.argv) > 1 else "scenes/cornell.txt"
    print("backend:", jax.default_backend(), "scene:", scene_path,
          flush=True)
    s = load_scene(os.path.join(ROOT, scene_path))
    gt = tuple(int(t) for t in np.asarray(s.geoms.type))
    cfg = I.TraceConfig(width=W, height=H, trace_depth=DEPTH,
                        antialias=True, geom_types=gt, glossy=False,
                        sky=False)
    key = jax.random.PRNGKey(0)

    def time_epoch(fn):
        a = fn(jnp.zeros((H, W, 3), jnp.float32), 0)
        jax.block_until_ready(a)
        best = float("inf")
        for r in (1, 2, 3):
            t0 = time.perf_counter()
            a = fn(a, r)
            jax.block_until_ready(a)
            best = min(best, time.perf_counter() - t0)
        return best * 1e3 / CHUNK

    # A: production form — scene tables as traced args
    def epoch_args(acc, r):
        return I.render_chunk(acc, s.materials, s.camera.flat(), s.geoms,
                              s.meshes, s.textures,
                              jax.random.fold_in(key, r), 0, cfg, CHUNK)

    # B: baked form — scene tables captured as numpy constants
    geoms_c = jax.tree_util.tree_map(np.asarray, s.geoms)
    mats_c = jax.tree_util.tree_map(np.asarray, s.materials)
    tex_c = jax.tree_util.tree_map(np.asarray, s.textures)
    cam_c = {k: (np.asarray(v) if hasattr(v, "shape") else v)
             for k, v in s.camera.flat().items()}

    from functools import partial

    @partial(jax.jit, static_argnames=("c",), donate_argnames=("acc",))
    def baked_chunk(acc, base_key, c):
        def one(a, i):
            k = jax.random.fold_in(base_key, i)
            return a + I.render_radiance(mats_c, cam_c, geoms_c, s.meshes,
                                         tex_c, k, c), None
        out, _ = jax.lax.scan(one, acc, jnp.arange(CHUNK, dtype=jnp.int32))
        return out

    def epoch_baked(acc, r):
        return baked_chunk(acc, jax.random.fold_in(key, r), cfg)

    # C: practical form — bake geoms+materials only, camera stays traced
    # (interactive orbit must not recompile), textures/meshes stay args
    @partial(jax.jit, static_argnames=("c",), donate_argnames=("acc",))
    def baked_gm_chunk(acc, cam, textures, base_key, c):
        def one(a, i):
            k = jax.random.fold_in(base_key, i)
            return a + I.render_radiance(mats_c, cam, geoms_c, s.meshes,
                                         textures, k, c), None
        out, _ = jax.lax.scan(one, acc, jnp.arange(CHUNK, dtype=jnp.int32))
        return out

    def epoch_gm(acc, r):
        return baked_gm_chunk(acc, s.camera.flat(), s.textures,
                              jax.random.fold_in(key, r), cfg)

    ms_a = time_epoch(epoch_args)
    print(f"traced-args scene:  {ms_a:.2f} ms/iter", flush=True)
    ms_b = time_epoch(epoch_baked)
    print(f"baked-const scene:  {ms_b:.2f} ms/iter ({ms_a/ms_b:.2f}x)",
          flush=True)
    ms_c = time_epoch(epoch_gm)
    print(f"baked geom+mat:     {ms_c:.2f} ms/iter ({ms_a/ms_c:.2f}x)",
          flush=True)

    # D: bake geoms+materials+textures, camera traced
    @partial(jax.jit, static_argnames=("c",), donate_argnames=("acc",))
    def baked_gmt_chunk(acc, cam, base_key, c):
        def one(a, i):
            k = jax.random.fold_in(base_key, i)
            return a + I.render_radiance(mats_c, cam, geoms_c, s.meshes,
                                         tex_c, k, c), None
        out, _ = jax.lax.scan(one, acc, jnp.arange(CHUNK, dtype=jnp.int32))
        return out

    def epoch_gmt(acc, r):
        return baked_gmt_chunk(acc, s.camera.flat(),
                               jax.random.fold_in(key, r), cfg)

    ms_d = time_epoch(epoch_gmt)
    print(f"baked g+m+tex:      {ms_d:.2f} ms/iter ({ms_a/ms_d:.2f}x)",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
