"""8-wide BVH (ops/bvh8): builder invariants, traversal parity with the
binary packet kernel, occlusion-bound pruning, end-to-end render equality."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from project3_cuda_path_tracer_tpu import load_scene
from project3_cuda_path_tracer_tpu.ops import pallas_bvh as PB
from project3_cuda_path_tracer_tpu.ops import bvh8 as PB8
from project3_cuda_path_tracer_tpu.render.integrator import Renderer


@pytest.fixture(scope="module")
def blob():
    s = load_scene("scenes/mesh.txt")
    return s


@pytest.fixture(scope="module")
def packed8(blob):
    return PB8.pack_mesh8(blob.meshes, 0)


@pytest.fixture(scope="module")
def packed2(blob):
    # the binary skip-pointer packing (no longer the parser default)
    return PB.pack_mesh(blob.meshes, 0)


def _aimed_rays(n, seed=0):
    """Rays from random origins outside the unit blob aimed near its
    center, so most of them hit."""
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(3, n)).astype(np.float32)
    o /= np.linalg.norm(o, axis=0, keepdims=True)
    o *= 3.0
    target = rng.uniform(-0.4, 0.4, size=(3, n)).astype(np.float32)
    d = target - o
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    qo = tuple(jnp.asarray(c) for c in o)
    qd = tuple(jnp.asarray(c) for c in d)
    return qo, qd


def test_leaf_metas_cover_all_triangles_once(blob, packed8):
    ni = np.asarray(packed8.nodes_i)
    encs = ni[:, 0:8]
    metas = -encs[encs <= -2] - 2  # leaf encodings are -(meta)-2
    # real (non-pad) tri count from the mesh bundle itself — the packed
    # table carries 8 degenerate pad rows for block leaf loads
    n_tris = int(np.asarray(blob.meshes.tri_v0).shape[0])
    assert np.asarray(packed8.tris).shape[0] == n_tris + 8
    cover = np.zeros(n_tris, np.int32)
    for meta in metas:
        st, ct = meta // 32, meta % 32
        cover[st:st + ct] += 1
    assert (cover == 1).all()


def test_wide_tree_is_smaller(packed2, packed8):
    b2 = np.asarray(packed2.nodes_f).shape[0]
    b8 = np.asarray(packed8.nodes_f).shape[0]
    assert b8 < b2 / 4  # ~7x fewer interior nodes in an 8-ary tree


def test_parser_default_is_wide(blob):
    assert isinstance(blob.packed_meshes[0], PB8.PackedMesh8)


def test_traversal_parity(packed2, packed8):
    qo, qd = _aimed_rays(2048)
    t2, n2, u2, v2, tri2 = PB.traverse_packets(qo, qd, packed2)
    t8, n8, u8, v8, tri8 = PB8.traverse_packets8(qo, qd, packed8)
    tri2, tri8 = np.asarray(tri2), np.asarray(tri8)
    hit2, hit8 = tri2 >= 0, tri8 >= 0
    assert hit2.sum() > 1500  # aimed rays really hit
    np.testing.assert_array_equal(hit2, hit8)
    np.testing.assert_allclose(np.asarray(t8)[hit8], np.asarray(t2)[hit2],
                               rtol=1e-5)
    # both kernels pick the same globally nearest triangle
    np.testing.assert_array_equal(tri8[hit8], tri2[hit2])
    for a, b in zip(n8, n2):
        np.testing.assert_allclose(np.asarray(a)[hit8],
                                   np.asarray(b)[hit2],
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(u8)[hit8], np.asarray(u2)[hit2],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v8)[hit8], np.asarray(v2)[hit2],
                               rtol=1e-4, atol=1e-5)


def test_occlusion_bound_prunes(packed8):
    """Rays bounded tighter than their hit distance must report a miss
    (the binary kernel's occlusion contract, ops/pallas_bvh.py)."""
    qo, qd = _aimed_rays(1024, seed=1)
    t8, _, _, _, tri8 = PB8.traverse_packets8(qo, qd, packed8)
    hit = np.asarray(tri8) >= 0
    t_hit = np.asarray(t8)
    bound = jnp.asarray(np.where(hit, t_hit * 0.5, 1e30), jnp.float32)
    _, _, _, _, tri_b = PB8.traverse_packets8(qo, qd, packed8,
                                              t_bound=bound)
    assert (np.asarray(tri_b)[hit] == -1).all()


def test_render_matches_binary_path():
    """End-to-end: the integrator dispatches on the packed type; the 8-wide
    image (the parser default) must equal the binary-tree image (same RNG,
    same nearest hits)."""
    s8 = load_scene("scenes/mesh.txt")
    s8.camera.resolution = (64, 64)
    s8.camera.derive()
    s8.settings.trace_depth = 3
    assert isinstance(s8.packed_meshes[0], PB8.PackedMesh8)
    r8 = Renderer(s8)
    r8.render(2, seed=3)

    s2 = load_scene("scenes/mesh.txt")
    s2.camera.resolution = (64, 64)
    s2.camera.derive()
    s2.settings.trace_depth = 3
    s2.packed_meshes = PB.pack_all(s2.meshes)  # binary kernel
    r2 = Renderer(s2)
    r2.render(2, seed=3)

    np.testing.assert_allclose(r8.image(), r2.image(), atol=1e-5)


def test_streams2_matches_streams1(blob, packed8):
    """Multi-stream interleaved traversal (latency hiding) must be an
    exact no-op on results: two packets per kernel instance, own stacks."""
    import project3_cuda_path_tracer_tpu.ops.bvh8 as B8
    qo, qd = _aimed_rays(4096 * 2, seed=3)
    r1 = B8.traverse_packets8(qo, qd, packed8, sub=16, streams=1)
    r2 = B8.traverse_packets8(qo, qd, packed8, sub=16, streams=2)
    for a, b in zip(jax.tree_util.tree_leaves(r1),
                    jax.tree_util.tree_leaves(r2)):
        assert (np.asarray(a) == np.asarray(b)).all()
