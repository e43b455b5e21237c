"""BSDF sampling + the shading/scattering stage (wavefront stage 3).

Implements the scatterRay contract the reference leaves TODO
(reference: src/interactions.h:44-79): probabilistically choose among
diffuse / perfect-specular / refractive lobes, divide the branch's
contribution by its probability, and mutate (ray, color) in place.
Lobe probabilities come straight from the material's REFL / REFR floats
(reference: src/sceneStructs.h:31-41, scenes/cornell.txt:41-49), so REFL=1
is a deterministic mirror and fractional values give the documented
probability-weighted mix.

The cosine-weighted hemisphere sampler reproduces
calculateRandomDirectionInHemisphere exactly
(reference: src/interactions.h:10-42).

Differentiability: all *sampling decisions* (directions, lobe choice,
Fresnel coin flip) are wrapped in stop_gradient — detached-sampling Monte
Carlo — while the *throughput factors* (albedo, specular color, emittance)
stay differentiable, so jax.grad w.r.t. material parameters matches finite
differences in expectation.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..scene import types as T
from ..utils.math import SQRT_OF_ONE_THIRD, TWO_PI, RAY_EPS


class Lobes:
    DIFFUSE = 0
    SPECULAR = 1
    REFRACTIVE = 2


def cosine_hemisphere(normal: jnp.ndarray, u1: jnp.ndarray, u2: jnp.ndarray):
    """Cosine-weighted hemisphere sample around `normal`
    (reference: src/interactions.h:10-42, incl. the SQRT_OF_ONE_THIRD
    axis-pick trick for the tangent frame)."""
    up = jnp.sqrt(u1)
    over = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    around = u2 * TWO_PI

    ax, ay = jnp.abs(normal[:, 0]), jnp.abs(normal[:, 1])
    pick_x = ax < SQRT_OF_ONE_THIRD
    pick_y = (~pick_x) & (ay < SQRT_OF_ONE_THIRD)
    not_normal = jnp.stack([
        jnp.where(pick_x, 1.0, 0.0),
        jnp.where(pick_y, 1.0, 0.0),
        jnp.where(pick_x | pick_y, 0.0, 1.0),
    ], axis=-1)

    p1 = jnp.cross(normal, not_normal)
    p1 = p1 / jnp.linalg.norm(p1, axis=-1, keepdims=True)
    p2 = jnp.cross(normal, p1)
    p2 = p2 / jnp.linalg.norm(p2, axis=-1, keepdims=True)

    return (up[:, None] * normal
            + (jnp.cos(around) * over)[:, None] * p1
            + (jnp.sin(around) * over)[:, None] * p2)


def reflect(d: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    return d - 2.0 * jnp.sum(d * n, axis=-1, keepdims=True) * n


def refract(d: jnp.ndarray, n: jnp.ndarray, eta: jnp.ndarray):
    """Snell refraction; returns (dir, total_internal_reflection mask)."""
    cos_i = -jnp.sum(d * n, axis=-1)
    sin2_t = eta * eta * jnp.maximum(1.0 - cos_i * cos_i, 0.0)
    tir = sin2_t > 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    out = eta[:, None] * d + (eta * cos_i - cos_t)[:, None] * n
    return out, tir


def schlick(cos_i: jnp.ndarray, eta_i: jnp.ndarray, eta_t: jnp.ndarray):
    r0 = ((eta_i - eta_t) / (eta_i + eta_t)) ** 2
    return r0 + (1.0 - r0) * (1.0 - cos_i) ** 5


class ShadeOut(NamedTuple):
    origin: jnp.ndarray       # [N,3] next-bounce origins
    direction: jnp.ndarray    # [N,3]
    throughput: jnp.ndarray   # [N,3] updated path throughput ("color")
    radiance: jnp.ndarray     # [N,3] radiance emitted into the path this bounce
    alive: jnp.ndarray        # [N] still tracing after this bounce


def sample_env(textures: T.Textures, d: jnp.ndarray) -> jnp.ndarray:
    """Equirect environment lookup for miss rays (extension; the reference
    background is black, src/sceneStructs.h:8)."""
    he, we = textures.env.shape[0], textures.env.shape[1]
    u = 0.5 + jnp.arctan2(d[:, 0], -d[:, 2]) / (2.0 * jnp.pi)
    v = jnp.arccos(jnp.clip(d[:, 1], -1.0, 1.0)) / jnp.pi
    xi = jnp.clip((u * we).astype(jnp.int32), 0, we - 1)
    yi = jnp.clip((v * he).astype(jnp.int32), 0, he - 1)
    return textures.env[yi, xi] * textures.env_enabled


def sample_texture(textures: T.Textures, mat_id: jnp.ndarray,
                   uv: jnp.ndarray, base_color: jnp.ndarray) -> jnp.ndarray:
    """Albedo = texture sample where the material is textured, else its RGB."""
    rect = textures.rect[mat_id]            # [N,4] x,y,w,h
    tid = textures.tex_id[mat_id]
    u = jnp.mod(uv[:, 0], 1.0)
    v = jnp.mod(uv[:, 1], 1.0)
    xi = rect[:, 0] + jnp.clip((u * rect[:, 2]).astype(jnp.int32), 0,
                               jnp.maximum(rect[:, 2] - 1, 0))
    yi = rect[:, 1] + jnp.clip(((1.0 - v) * rect[:, 3]).astype(jnp.int32), 0,
                               jnp.maximum(rect[:, 3] - 1, 0))
    ha, wa = textures.atlas.shape[0], textures.atlas.shape[1]
    texel = textures.atlas[jnp.clip(yi, 0, ha - 1), jnp.clip(xi, 0, wa - 1)]
    return jnp.where((tid >= 0)[:, None], texel, base_color)


def shade(hit, ray_d: jnp.ndarray, throughput: jnp.ndarray,
          alive: jnp.ndarray, materials: T.Materials,
          textures: T.Textures, uniforms: jnp.ndarray,
          last_bounce: jnp.ndarray) -> ShadeOut:
    """One shading/scattering step over the whole wavefront.

    uniforms: [N,4] iid U(0,1) — (lobe select, hemisphere u1, hemisphere u2,
    Fresnel coin). Termination semantics follow the completed-scaffold
    contract (reference: src/pathtrace.cu:224-266 + interactions.h:44-68):
    light hit -> radiance += throughput*color*emittance, terminate;
    miss -> env/black, terminate; depth exhausted without a light -> 0.
    """
    n = ray_d.shape[0]
    mat_id = hit.mat_id
    color = materials.color[mat_id]
    albedo = sample_texture(textures, mat_id, hit.uv, color)
    spec_color = materials.specular_color[mat_id]
    emittance = materials.emittance[mat_id]
    p_refr = jnp.clip(materials.has_refractive[mat_id], 0.0, 1.0)
    p_spec = jnp.clip(materials.has_reflective[mat_id], 0.0, 1.0) * (1.0 - p_refr)
    p_diff = jnp.maximum(1.0 - p_refr - p_spec, 0.0)
    ior = materials.ior[mat_id]

    hit_ok = hit.t > 0.0
    is_light = hit_ok & (emittance > 0.0)
    missed = ~hit_ok

    # --- emitted radiance this bounce -------------------------------------
    env = sample_env(textures, ray_d)
    radiance = jnp.where(
        (alive & is_light)[:, None], throughput * color * emittance[:, None],
        jnp.where((alive & missed)[:, None], throughput * env, 0.0))

    # --- lobe selection (detached) -----------------------------------------
    u_lobe = jax.lax.stop_gradient(uniforms[:, 0])
    take_refr = u_lobe < p_refr
    take_spec = (~take_refr) & (u_lobe < p_refr + p_spec)
    take_diff = ~(take_refr | take_spec)

    normal = hit.normal
    # diffuse (cosine-weighted; cos/pdf cancels so throughput *= albedo/p)
    d_diff = cosine_hemisphere(normal, uniforms[:, 1], uniforms[:, 2])

    # perfect specular mirror
    d_spec = reflect(ray_d, normal)

    # refractive with Schlick-Fresnel lobe choice (detached coin)
    outside = hit.outside
    eta = jnp.where(outside, 1.0 / jnp.maximum(ior, 1e-6),
                    jnp.maximum(ior, 1e-6))
    cos_i = jnp.clip(-jnp.sum(ray_d * normal, axis=-1), 0.0, 1.0)
    eta_i = jnp.where(outside, 1.0, ior)
    eta_t = jnp.where(outside, ior, 1.0)
    fres = schlick(cos_i, eta_i, eta_t)
    d_refr, tir = refract(ray_d, normal, eta)
    u_fres = jax.lax.stop_gradient(uniforms[:, 3])
    refl_instead = tir | (u_fres < jax.lax.stop_gradient(fres))
    d_refr = jnp.where(refl_instead[:, None], d_spec, d_refr)

    new_dir = jnp.where(take_refr[:, None], d_refr,
                        jnp.where(take_spec[:, None], d_spec, d_diff))
    new_dir = jax.lax.stop_gradient(
        new_dir / jnp.linalg.norm(new_dir, axis=-1, keepdims=True))

    # throughput factor: branch albedo / branch probability
    # (reference contract: src/interactions.h:55-62)
    f_diff = albedo / jnp.maximum(p_diff, 1e-6)[:, None]
    f_spec = spec_color / jnp.maximum(p_spec, 1e-6)[:, None]
    f_refr = spec_color / jnp.maximum(p_refr, 1e-6)[:, None]
    factor = jnp.where(take_refr[:, None], f_refr,
                       jnp.where(take_spec[:, None], f_spec, f_diff))

    scattering = alive & hit_ok & ~is_light
    new_throughput = jnp.where(scattering[:, None], throughput * factor,
                               throughput)

    # next-ray origin: the backed-off hit point (getPointOnRay semantics);
    # refracted rays push through the surface instead.
    push = jnp.where((take_refr & ~refl_instead)[:, None],
                     2.0 * RAY_EPS * new_dir, 0.0)
    new_origin = hit.point + push

    still_alive = scattering & ~last_bounce
    return ShadeOut(origin=new_origin, direction=new_dir,
                    throughput=new_throughput, radiance=radiance,
                    alive=still_alive)
