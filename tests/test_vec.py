"""Planar vec3 module unit tests (ops/vec.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from project3_cuda_path_tracer_tpu.ops import vec
from project3_cuda_path_tracer_tpu.ops.vec import V3


def rand_v3(seed, n=64):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, 3)).astype(np.float32)
    return jnp.asarray(a), vec.from_rows(jnp.asarray(a))


def test_roundtrip_rows():
    rows, v = rand_v3(0)
    np.testing.assert_array_equal(np.asarray(vec.to_rows(v)),
                                  np.asarray(rows))


def test_arithmetic_matches_numpy():
    ra, a = rand_v3(1)
    rb, b = rand_v3(2)
    np.testing.assert_allclose(np.asarray(vec.to_rows(a + b)),
                               np.asarray(ra + rb), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vec.to_rows(a - b)),
                               np.asarray(ra - rb), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vec.to_rows(a * 2.0)),
                               np.asarray(ra * 2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vec.to_rows(-a)),
                               -np.asarray(ra), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vec.to_rows(a / b)),
                               np.asarray(ra / rb), rtol=1e-5)


def test_dot_cross_norm():
    ra, a = rand_v3(3)
    rb, b = rand_v3(4)
    np.testing.assert_allclose(np.asarray(vec.dot(a, b)),
                               (np.asarray(ra) * np.asarray(rb)).sum(-1),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(vec.to_rows(vec.cross(a, b))),
                               np.cross(np.asarray(ra), np.asarray(rb)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(vec.norm(a)),
                               np.linalg.norm(np.asarray(ra), axis=-1),
                               rtol=1e-5)
    nrm = np.asarray(vec.norm(vec.normalize(a)))
    np.testing.assert_allclose(nrm, 1.0, atol=1e-5)


def test_xform_matches_matrix():
    rng = np.random.default_rng(5)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = rng.normal(size=(3, 3))
    m[:3, 3] = rng.normal(size=3)
    ra, a = rand_v3(6)
    pts = np.asarray(ra) @ m[:3, :3].T + m[:3, 3]
    np.testing.assert_allclose(
        np.asarray(vec.to_rows(vec.xform_pt(jnp.asarray(m), a))), pts,
        rtol=2e-5, atol=1e-5)
    dirs = np.asarray(ra) @ m[:3, :3].T
    np.testing.assert_allclose(
        np.asarray(vec.to_rows(vec.xform_dir(jnp.asarray(m), a))), dirs,
        rtol=2e-5, atol=1e-5)


def test_where_and_splat():
    ra, a = rand_v3(7)
    rb, b = rand_v3(8)
    c = jnp.asarray(np.arange(64) % 2 == 0)
    out = np.asarray(vec.to_rows(vec.where(c, a, b)))
    expect = np.where(np.asarray(c)[:, None], np.asarray(ra),
                      np.asarray(rb))
    np.testing.assert_array_equal(out, expect)

    s = vec.splat((1.0, 2.0, 3.0), like=a.x)
    assert np.asarray(s.y).shape == (64,)
    np.testing.assert_array_equal(np.asarray(s.z), np.full(64, 3.0))


def test_v3_is_pytree():
    _, a = rand_v3(9)
    doubled = jax.tree_util.tree_map(lambda x: x * 2, a)
    np.testing.assert_allclose(np.asarray(doubled.x),
                               np.asarray(a.x) * 2)
