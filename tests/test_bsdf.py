"""BSDF / scattering tests: sampler distribution, reflection/refraction
math, energy conservation (SURVEY §4; reference contract:
src/interactions.h:10-79)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from project3_cuda_path_tracer_tpu.ops import bsdf


def test_cosine_hemisphere_is_normalized_and_upper():
    key = jax.random.PRNGKey(0)
    n = 20000
    normal = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    u = jax.random.uniform(key, (n, 2))
    d = bsdf.cosine_hemisphere(normal, u[:, 0], u[:, 1])
    norms = np.linalg.norm(np.asarray(d), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    assert (np.asarray(d[:, 2]) >= -1e-6).all()


def test_cosine_hemisphere_distribution():
    """cos-weighted pdf => E[cos theta] = 2/3, E[cos^2 theta] = 1/2."""
    key = jax.random.PRNGKey(1)
    n = 200000
    normal = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (n, 1))
    u = jax.random.uniform(key, (n, 2))
    d = np.asarray(bsdf.cosine_hemisphere(normal, u[:, 0], u[:, 1]))
    cos = d[:, 1]
    assert cos.mean() == pytest.approx(2.0 / 3.0, abs=5e-3)
    assert (cos ** 2).mean() == pytest.approx(0.5, abs=5e-3)
    # azimuthal symmetry
    assert d[:, 0].mean() == pytest.approx(0.0, abs=5e-3)
    assert d[:, 2].mean() == pytest.approx(0.0, abs=5e-3)


def test_cosine_hemisphere_arbitrary_axis():
    key = jax.random.PRNGKey(2)
    n = 50000
    axis = jnp.array([1.0, 1.0, 1.0]) / np.sqrt(3.0)
    normal = jnp.tile(axis[None], (n, 1))
    u = jax.random.uniform(key, (n, 2))
    d = np.asarray(bsdf.cosine_hemisphere(normal, u[:, 0], u[:, 1]))
    cos = d @ np.asarray(axis)
    assert (cos >= -1e-6).all()
    assert cos.mean() == pytest.approx(2.0 / 3.0, abs=5e-3)


def test_reflect():
    d = jnp.array([[1.0, -1.0, 0.0]]) / np.sqrt(2.0)
    n = jnp.array([[0.0, 1.0, 0.0]])
    r = np.asarray(bsdf.reflect(d, n))[0]
    np.testing.assert_allclose(r, [1 / np.sqrt(2), 1 / np.sqrt(2), 0],
                               atol=1e-6)


def test_refract_straight_through():
    d = jnp.array([[0.0, -1.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    out, tir = bsdf.refract(d, n, jnp.array([1.0 / 1.5]))
    np.testing.assert_allclose(np.asarray(out)[0], [0, -1, 0], atol=1e-6)
    assert not bool(tir[0])


def test_refract_snell_angle():
    # 45 deg incidence air->glass (eta=1/1.5): sin(t) = sin(45)/1.5
    th_i = np.pi / 4
    d = jnp.array([[np.sin(th_i), -np.cos(th_i), 0.0]], dtype=jnp.float32)
    n = jnp.array([[0.0, 1.0, 0.0]])
    out, tir = bsdf.refract(d, n, jnp.array([1.0 / 1.5], dtype=jnp.float32))
    out = np.asarray(out)[0]
    sin_t = out[0] / np.linalg.norm(out)
    assert sin_t == pytest.approx(np.sin(th_i) / 1.5, abs=1e-5)
    assert not bool(tir[0])


def test_total_internal_reflection():
    # glass->air beyond critical angle (sin c = 1/1.5 -> c ~ 41.8deg)
    th_i = np.deg2rad(60)
    d = jnp.array([[np.sin(th_i), -np.cos(th_i), 0.0]], dtype=jnp.float32)
    n = jnp.array([[0.0, 1.0, 0.0]])
    _, tir = bsdf.refract(d, n, jnp.array([1.5], dtype=jnp.float32))
    assert bool(tir[0])


def test_schlick_limits():
    # normal incidence: R0 = ((1-1.5)/(2.5))^2 = 0.04; grazing -> 1
    r0 = float(bsdf.schlick(jnp.array([1.0]), jnp.array([1.0]),
                            jnp.array([1.5]))[0])
    assert r0 == pytest.approx(0.04, abs=1e-6)
    rg = float(bsdf.schlick(jnp.array([0.0]), jnp.array([1.0]),
                            jnp.array([1.5]))[0])
    assert rg == pytest.approx(1.0, abs=1e-6)


def test_glossy_phong_lobe():
    """SPECEX > 0 widens the mirror into a cos^n lobe: samples concentrate
    around the reflection direction with spread shrinking as the exponent
    grows."""
    import dataclasses
    from project3_cuda_path_tracer_tpu.ops import wavefront as wf, vec
    from project3_cuda_path_tracer_tpu.ops.vec import V3
    from project3_cuda_path_tracer_tpu.scene import types as T

    n = 8192
    mats = T.Materials.zeros(1)
    mats = dataclasses.replace(
        mats,
        specular_color=jnp.ones((1, 3)),
        has_reflective=jnp.ones((1,)),
        color=jnp.full((1, 3), 0.5))

    def spread_for(exponent):
        m = dataclasses.replace(
            mats, specular_exponent=jnp.full((1,), float(exponent)))
        ones = jnp.ones((n,))
        zeros = jnp.zeros((n,))
        hit = wf.HitP(t=ones * 5.0, normal=V3(zeros, ones, zeros),
                      mat_id=jnp.zeros((n,), jnp.int32),
                      point=V3(zeros, zeros, zeros),
                      surf=V3(zeros, zeros, zeros), u=zeros, v=zeros,
                      outside=jnp.ones((n,), bool))
        d_in = vec.normalize(V3(ones * 0.5, -ones, zeros))
        u = jax.random.uniform(jax.random.PRNGKey(0), (4, n))
        out = wf.shade_planar(hit, d_in, V3(ones, ones, ones),
                              jnp.ones((n,), bool), m,
                              T.Textures.none(1), u, jnp.zeros((n,), bool))
        mirror = vec.normalize(V3(ones * 0.5, ones, zeros))
        cos_to_mirror = np.asarray(vec.dot(out.direction, mirror))
        return 1.0 - cos_to_mirror.mean()

    s_exact = spread_for(0)       # perfect mirror: zero spread
    s_wide = spread_for(8)
    s_tight = spread_for(512)
    assert s_exact < 1e-6
    assert s_tight < s_wide
    assert s_wide > 1e-3


def test_glass_sphere_center_ray_goes_straight():
    """A ray aimed at a glass sphere's center hits both interfaces at
    normal incidence: transmission leaves the direction unchanged (Snell
    at cos_i = 1), so after two refractions the ray continues straight."""
    import dataclasses
    from project3_cuda_path_tracer_tpu.ops import wavefront as wf, vec
    from project3_cuda_path_tracer_tpu.ops.vec import V3
    from project3_cuda_path_tracer_tpu.scene import types as T
    from project3_cuda_path_tracer_tpu.utils import math as m

    tr = m.build_transformation_matrix((0, 0, 0), (0, 0, 0), (2, 2, 2))
    geoms = T.Geoms(
        type=jnp.array([T.SPHERE], jnp.int32),
        material_id=jnp.array([0], jnp.int32),
        transform=jnp.asarray(tr)[None],
        inverse_transform=jnp.asarray(m.inverse(tr))[None],
        inverse_transpose=jnp.asarray(m.inverse_transpose(tr))[None],
        velocity=jnp.zeros((1, 3)), mesh_id=-jnp.ones((1,), jnp.int32))
    mats = dataclasses.replace(
        T.Materials.zeros(1),
        specular_color=jnp.ones((1, 3)),
        has_refractive=jnp.ones((1,)),
        ior=jnp.full((1,), 1.5))
    tx = T.Textures.none(1)

    n = 8
    o = vec.from_rows(jnp.tile(jnp.array([[0.3, 0.2, 5.0]]), (n, 1)))
    # aim exactly at the center so incidence is normal at both interfaces
    d = vec.normalize(vec.from_rows(
        jnp.tile(jnp.array([[-0.3, -0.2, -5.0]]), (n, 1))))
    d0 = np.asarray(vec.to_rows(d))[0]
    times = jnp.zeros((n,))
    thr = V3(jnp.ones(n), jnp.ones(n), jnp.ones(n))
    alive = jnp.ones(n, bool)
    # u_fres = 0.999 > Schlick(1.0) = 0.04 -> transmit at both interfaces
    u = jnp.stack([jnp.zeros(n), jnp.full((n,), 0.5),
                   jnp.full((n,), 0.5), jnp.full((n,), 0.999)])

    for bounce in range(2):
        hit = wf.intersect_planar(o, d, times, geoms, T.MeshBundle.empty(),
                                  (T.SPHERE,))
        assert (np.asarray(hit.t) > 0).all(), f"missed at bounce {bounce}"
        out = wf.shade_planar(hit, d, thr, alive, mats, tx, u,
                              jnp.zeros(n, bool))
        o, d, thr, alive = out.origin, out.direction, out.throughput, \
            out.alive
        np.testing.assert_allclose(np.asarray(vec.to_rows(d))[0], d0,
                                   atol=1e-4)

    # after exiting, the ray must miss the sphere (it's behind)
    hit = wf.intersect_planar(o, d, times, geoms, T.MeshBundle.empty(),
                              (T.SPHERE,))
    assert (np.asarray(hit.t) < 0).all()
