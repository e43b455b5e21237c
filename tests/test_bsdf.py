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
                      point=V3(zeros, zeros, zeros), u=zeros, v=zeros,
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
