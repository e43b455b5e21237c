"""OBJ loader + BVH build/traversal tests (reference TODO slot:
src/pathtrace.cu:188). Traversal must agree with brute-force triangle
intersection on random rays."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from project3_cuda_path_tracer_tpu.scene import bvh as B
from project3_cuda_path_tracer_tpu.ops import intersect as isect

CUBE_OBJ = """
v -1 -1 -1
v  1 -1 -1
v  1  1 -1
v -1  1 -1
v -1 -1  1
v  1 -1  1
v  1  1  1
v -1  1  1
f 1 3 2
f 1 4 3
f 5 6 7
f 5 7 8
f 1 2 6
f 1 6 5
f 2 3 7
f 2 7 6
f 3 4 8
f 3 8 7
f 4 1 5
f 4 5 8
"""


@pytest.fixture(scope="module")
def cube_obj(tmp_path_factory):
    p = tmp_path_factory.mktemp("obj") / "cube.obj"
    p.write_text(CUBE_OBJ)
    return str(p)


def test_load_obj_triangulates(cube_obj):
    v, n, t = B.load_obj(cube_obj)
    assert v.shape == (12, 3, 3)
    assert n.shape == (12, 3, 3)
    # generated face normals are unit length
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)


def test_load_obj_quad_and_negative_indices(tmp_path):
    p = tmp_path / "q.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf -4 -3 -2 -1\n")
    v, _, _ = B.load_obj(str(p))
    assert v.shape == (2, 3, 3)  # quad -> 2 tris


def test_bvh_structure(cube_obj):
    v, _, _ = B.load_obj(cube_obj)
    perm, lo, hi, start, count, skip, right = B.build_bvh(v)
    assert sorted(perm.tolist()) == list(range(12))
    # root AABB covers the whole mesh
    np.testing.assert_allclose(lo[0], [-1, -1, -1], atol=1e-6)
    np.testing.assert_allclose(hi[0], [1, 1, 1], atol=1e-6)
    # every leaf holds <= LEAF_K tris and all leaves cover all tris once
    leaf = count > 0
    assert count[leaf].max() <= isect.LEAF_K
    assert count[leaf].sum() == 12
    # root's escape is the exit
    assert skip[0] == -1


def _brute_force(o, d, v):
    """Reference-free brute force Moller-Trumbore over all tris."""
    v0, e1, e2 = v[:, 0], v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]
    best = np.full(o.shape[0], 1e30)
    for i in range(v.shape[0]):
        pvec = np.cross(d, e2[i])
        det = (e1[i] * pvec).sum(-1)
        ok = np.abs(det) > 1e-12
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tvec = o - v0[i]
        u = (tvec * pvec).sum(-1) * inv
        qvec = np.cross(tvec, e1[i])
        vv = (d * qvec).sum(-1) * inv
        t = (e2[i] * qvec).sum(-1) * inv
        hit = ok & (u >= 0) & (vv >= 0) & (u + vv <= 1) & (t > 1e-6)
        best = np.where(hit & (t < best), t, best)
    return best


def test_traversal_matches_brute_force(cube_obj):
    bundle = B.build_mesh_bundle([cube_obj])
    rng = np.random.default_rng(0)
    n = 256
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    t_bvh, tri, u, v_ = jax.jit(
        lambda o, d: isect.bvh_traverse(o, d, bundle, bundle.mesh_root[0])
    )(jnp.asarray(o), jnp.asarray(d))

    verts, _, _ = B.load_obj(cube_obj)
    t_ref = _brute_force(o, d, verts)

    t_bvh = np.asarray(t_bvh)
    hit_b = np.asarray(tri) >= 0
    hit_r = t_ref < 1e29
    np.testing.assert_array_equal(hit_b, hit_r)
    np.testing.assert_allclose(t_bvh[hit_b], t_ref[hit_r], rtol=1e-4)


def test_bunny_like_random_mesh():
    """Random triangle soup (200 tris): BVH equals brute force."""
    rng = np.random.default_rng(42)
    c = rng.uniform(-2, 2, (200, 1, 3))
    v = (c + rng.normal(scale=0.3, size=(200, 3, 3))).astype(np.float32)
    perm, lo, hi, start, count, skip, right = B.build_bvh(v)
    assert sorted(perm.tolist()) == list(range(200))

    import jax.numpy as jnp
    from project3_cuda_path_tracer_tpu.scene import types as T
    vp = v[perm]
    bundle = T.MeshBundle(
        tri_v0=jnp.asarray(vp[:, 0]),
        tri_e1=jnp.asarray(vp[:, 1] - vp[:, 0]),
        tri_e2=jnp.asarray(vp[:, 2] - vp[:, 0]),
        tri_n0=jnp.zeros((200, 3)), tri_n1=jnp.zeros((200, 3)),
        tri_n2=jnp.zeros((200, 3)),
        tri_uv0=jnp.zeros((200, 2)), tri_uv1=jnp.zeros((200, 2)),
        tri_uv2=jnp.zeros((200, 2)),
        node_lo=jnp.asarray(lo), node_hi=jnp.asarray(hi),
        node_right=jnp.asarray(right), node_start=jnp.asarray(start),
        node_count=jnp.asarray(count), node_skip=jnp.asarray(skip),
        mesh_root=jnp.zeros((1,), jnp.int32),
        mesh_tri_offset=jnp.zeros((1,), jnp.int32),
    )
    n = 128
    o = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_bvh, tri, _, _ = jax.jit(
        lambda o, d: isect.bvh_traverse(o, d, bundle, bundle.mesh_root[0])
    )(jnp.asarray(o), jnp.asarray(d))
    t_ref = _brute_force(o, d, vp)
    hit_b = np.asarray(tri) >= 0
    np.testing.assert_array_equal(hit_b, t_ref < 1e29)
    np.testing.assert_allclose(np.asarray(t_bvh)[hit_b], t_ref[hit_b],
                               rtol=1e-4)
