"""G-buffer construction for the à-trous denoiser (render/denoise.py).

Split out of denoise.py: the filter is pure image-space math; this module
owns the render-side queries (deterministic camera rays, first hits, the
one-level mirror relay, shade-faithful base albedo).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _base_albedo(scene, mat_id, u, v):
    """Shade-time base color for per-lane material ids: flat material
    color -> atlas texel -> procedural checker (the precedence of
    ops/wavefront.shade_planar)."""
    from ..ops import wavefront as wf
    from ..ops import vec
    mats, tex = scene.materials, scene.textures
    alb = wf._mat_select(mats.color, mat_id)
    if tex.atlas.shape[0] > 1 or tex.atlas.shape[1] > 1:
        alb = wf._sample_texture_planar(tex, mat_id, u, v, alb)
    cs = wf._mat_select(tex.checker_scale, mat_id)
    c2 = wf._mat_select(tex.checker_color2, mat_id)
    par = jnp.mod(jnp.floor(u * cs) + jnp.floor(v * cs), 2.0)
    return vec.where((cs > 0) & (par > 0.5), c2, alb)


def _lobe_probs(scene, mat_id):
    """(p_refr, p_spec) per lane — shade_planar's lobe split."""
    from ..ops import wavefront as wf
    mats = scene.materials
    p_refr = jnp.clip(wf._mat_select(mats.has_refractive, mat_id), 0., 1.)
    p_spec = (jnp.clip(wf._mat_select(mats.has_reflective, mat_id), 0., 1.)
              * (1.0 - p_refr))
    return p_refr, p_spec


def gbuffer(scene, cfg, packed_meshes=(), albedo: bool = False,
            relay: bool = True):
    """First-hit [H,W,3] (normal, world position) G-buffers from the
    deterministic (no-AA) camera rays. Miss lanes get normal 0 and a far
    constant position, so background pixels only mix with each other.

    Mirror relay: pixels whose first hit is specular-dominant carry the
    REFLECTED surface's geometry (one deterministic bounce) instead of the
    mirror's own — so the filter edge-stops on the reflected geometry and
    mirror images stay sharp (the course denoiser's documented first-hit
    limitation). Glass stays first-surface (the refracted direction needs
    Fresnel/TIR decisions that have no single deterministic answer).

    With `albedo=True` also returns the base-albedo plane for demodulated
    filtering: diffuse-dominant non-emissive hits carry their shade-time
    base color; through mirrors the factor is spec_color x (reflected
    surface's base color when that is diffuse non-emissive, else just
    spec_color); emissive / glass / miss lanes get 1 — their radiance is
    not albedo-separable, so they pass through unmodulated."""
    from ..ops import wavefront as wf
    from ..ops import vec
    o, d, times, pix = wf.generate_rays_planar(
        scene.camera.flat(), cfg.width, cfg.height, jax.random.PRNGKey(0),
        antialias=False, tile=cfg.tile)
    hit = wf.intersect_planar(o, d, times, scene.geoms, scene.meshes,
                              cfg.geom_types, packed_meshes, cfg.mesh_ids,
                              sdf_kinds=cfg.sdf_kinds)
    h, w = cfg.height, cfg.width
    p_refr1, p_spec1 = _lobe_probs(scene, hit.mat_id)

    # ---- one-level mirror relay (static-gated on the material table;
    # `relay=False` keeps the first-surface buffers, for A/B and tests)
    any_mirror = relay and bool(
        np.any(np.asarray(scene.materials.has_reflective) > 0))
    mirror = ((hit.t > 0.0) & (p_spec1 >= 0.5)) if any_mirror else None
    if any_mirror:
        ddn = vec.dot(d, hit.normal)
        d2 = vec.V3(d.x - 2.0 * ddn * hit.normal.x,
                    d.y - 2.0 * ddn * hit.normal.y,
                    d.z - 2.0 * ddn * hit.normal.z)
        hit2 = wf.intersect_planar(hit.point, d2, times, scene.geoms,
                                   scene.meshes, cfg.geom_types,
                                   packed_meshes, cfg.mesh_ids,
                                   sdf_kinds=cfg.sdf_kinds)
        eff_t = jnp.where(mirror, hit2.t, hit.t)
        eff_normal = vec.where(mirror, hit2.normal, hit.normal)
        eff_point = vec.where(mirror, hit2.point, hit.point)
        eff_mat = jnp.where(mirror, hit2.mat_id, hit.mat_id)
        eff_u = jnp.where(mirror, hit2.u, hit.u)
        eff_v = jnp.where(mirror, hit2.v, hit.v)
    else:
        eff_t, eff_normal, eff_point = hit.t, hit.normal, hit.point
        eff_mat, eff_u, eff_v = hit.mat_id, hit.u, hit.v

    miss = eff_t <= 0.0

    def plane(v, far=0.0):
        vals = jnp.where(miss, far, v)
        if cfg.tile:
            # mesh scenes emit paths in tile-swizzled order (TraceConfig
            # .tile); scatter back to row-major pixel order
            vals = jnp.zeros_like(vals).at[pix].set(vals)
        return vals.reshape(h, w)

    normal = jnp.stack([plane(eff_normal.x), plane(eff_normal.y),
                        plane(eff_normal.z)], axis=-1)
    pos = jnp.stack([plane(eff_point.x, 1e6), plane(eff_point.y, 1e6),
                     plane(eff_point.z, 1e6)], axis=-1)
    if not albedo:
        return normal, pos

    alb = _base_albedo(scene, eff_mat, eff_u, eff_v)
    p_refr_e, p_spec_e = _lobe_probs(scene, eff_mat)
    emitt_e = wf._mat_select(scene.materials.emittance, eff_mat)
    # the effective surface demodulates when it is a diffuse-dominant,
    # non-emissive hit (through a mirror: the reflected surface)
    ok = (eff_t > 0.0) & (emitt_e <= 0.0) & (p_refr_e + p_spec_e < 0.5)
    one = jnp.ones_like(alb.x)
    alb = vec.where(ok, alb, vec.V3(one, one, one))
    if any_mirror:
        # mirror pixels: radiance = spec_color x L_reflected, so the
        # specular tint demodulates unconditionally on those lanes
        spec1 = wf._mat_select(scene.materials.specular_color, hit.mat_id)
        alb = vec.where(mirror, vec.V3(alb.x * spec1.x, alb.y * spec1.y,
                                       alb.z * spec1.z), alb)
        demod_on = mirror | ok
    else:
        demod_on = ok

    def aplane(v):
        vals = jnp.where(demod_on, v, 1.0)
        if cfg.tile:
            vals = jnp.ones_like(vals).at[pix].set(vals)
        return vals.reshape(h, w)

    alb_img = jnp.stack([aplane(alb.x), aplane(alb.y), aplane(alb.z)],
                        axis=-1)
    return normal, pos, alb_img
