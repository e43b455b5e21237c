"""Render diagnostics (SURVEY §5.5): per-depth live-path histogram and
compaction ratios — the observability the scaffold's A/B experiments need
(how much work stream compaction could save per bounce,
reference: src/pathtrace.cu:313-317)."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import wavefront as wf
from ..ops.vec import V3
from . import integrator as integ
from ..scene import types as T


def live_path_histogram(scene: T.Scene, cfg: Optional[integ.TraceConfig]
                        = None, seed: int = 0) -> np.ndarray:
    """[trace_depth+1] live-path counts before each bounce (index 0 = all
    paths) for one iteration."""
    if cfg is None:
        w, h = scene.camera.resolution
        types = np.asarray(scene.geoms.type)
        cfg = integ.TraceConfig(
            width=w, height=h, trace_depth=scene.settings.trace_depth,
            antialias=scene.settings.antialias,
            geom_types=tuple(int(t) for t in types),
            mesh_ids=tuple(int(m) for m in np.asarray(scene.geoms.mesh_id)),
            unroll=bool(scene.packed_meshes),
        )

    @jax.jit
    def run(key):
        n = cfg.width * cfg.height
        k_gen, k_bounce = jax.random.split(key)
        o, d, times, pix = wf.generate_rays_planar(
            cam, cfg.width, cfg.height, k_gen, antialias=cfg.antialias,
            tile=cfg.tile)
        ones = jnp.ones((n,), jnp.float32)
        thr = V3(ones, ones, ones)
        alive = jnp.ones((n,), bool)
        keys = jax.random.split(k_bounce, cfg.trace_depth)
        counts = [jnp.sum(alive)]
        for depth in range(cfg.trace_depth):
            hit = wf.intersect_planar(o, d, times, scene.geoms, scene.meshes,
                                      cfg.geom_types, scene.packed_meshes,
                                      cfg.mesh_ids,
                                      sdf_kinds=cfg.sdf_kinds)
            u = jax.random.uniform(keys[depth], (4, n), jnp.float32)
            last = jnp.broadcast_to(depth >= cfg.trace_depth - 1,
                                    alive.shape)
            out = wf.shade_planar(hit, d, thr, alive, scene.materials,
                                  scene.textures, u, last)
            o, d, thr, alive = out.origin, out.direction, out.throughput, \
                out.alive
            counts.append(jnp.sum(alive))
        return jnp.stack(counts)

    cam = scene.camera.flat()
    return np.asarray(run(jax.random.PRNGKey(seed)))


def compaction_ratios(scene: T.Scene, seed: int = 0) -> np.ndarray:
    """Fraction of the wavefront still alive entering each bounce — the
    upper bound on what compaction can save."""
    h = live_path_histogram(scene, seed=seed).astype(np.float64)
    return h / h[0]
