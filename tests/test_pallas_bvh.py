"""Pallas packet BVH traversal vs the XLA gather walk (interpret mode on
CPU), and end-to-end mesh render parity between the two paths."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from project3_cuda_path_tracer_tpu import load_scene
from project3_cuda_path_tracer_tpu.scene import bvh as B
from project3_cuda_path_tracer_tpu.ops import pallas_bvh as PB
from project3_cuda_path_tracer_tpu.ops import intersect as isect
from project3_cuda_path_tracer_tpu.render.integrator import Renderer


@pytest.fixture(scope="module")
def torus_bundle():
    return B.build_mesh_bundle(["scenes/meshes/torus.obj"])


def test_pack_mesh_local_rebase(torus_bundle):
    packed = PB.pack_mesh(torus_bundle, 0)
    nodes_i = np.asarray(packed.nodes_i)
    b = nodes_i.shape[0]
    # skips stay in-range or -1; leaf starts within the local tri count
    assert ((nodes_i[:, 0] >= -1) & (nodes_i[:, 0] < b)).all()
    meta = nodes_i[:, 1]
    leaf = meta >= 0
    starts = meta[leaf] // 16
    counts = meta[leaf] % 16
    t = np.asarray(packed.tris).shape[0] - 1
    assert (starts + counts <= t).all()
    assert counts.sum() == t


def test_traversal_matches_xla_walk(torus_bundle):
    rng = np.random.default_rng(1)
    n = 2048
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    packed = PB.pack_mesh(torus_bundle, 0)
    t_p, (nx, ny, nz), u_p, v_p, tri_p = PB.traverse_packets(
        (jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2])),
        (jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2])),
        packed)

    t_r, tri_r, u_r, v_r = jax.jit(
        lambda o, d: isect.bvh_traverse(o, d, torus_bundle,
                                        torus_bundle.mesh_root[0])
    )(jnp.asarray(o), jnp.asarray(d))

    hit_r = np.asarray(tri_r) >= 0
    np.testing.assert_array_equal(np.asarray(tri_p) >= 0, hit_r)
    np.testing.assert_allclose(np.asarray(t_p)[hit_r],
                               np.asarray(t_r)[hit_r], rtol=1e-4)
    # The packet kernel interpolates IN-KERNEL: its (u,v) are texture-space
    # and its normal is the smooth normal; rebuild both from the XLA walk's
    # (tri, barycentric u, v) and compare.
    tri_s = np.maximum(np.asarray(tri_r), 0)
    bu = np.asarray(u_r)
    bv = np.asarray(v_r)
    bw = 1 - bu - bv

    def interp(a0, a1, a2):
        return (bw[:, None] * np.asarray(a0)[tri_s]
                + bu[:, None] * np.asarray(a1)[tri_s]
                + bv[:, None] * np.asarray(a2)[tri_s])

    n_ref = interp(torus_bundle.tri_n0, torus_bundle.tri_n1,
                   torus_bundle.tri_n2)
    uv_ref = interp(torus_bundle.tri_uv0, torus_bundle.tri_uv1,
                    torus_bundle.tri_uv2)
    got_n = np.stack([nx, ny, nz], -1)
    got_uv = np.stack([np.asarray(u_p), np.asarray(v_p)], -1)
    np.testing.assert_allclose(got_n[hit_r], n_ref[hit_r], atol=1e-4)
    np.testing.assert_allclose(got_uv[hit_r], uv_ref[hit_r, :2], atol=1e-4)


def test_mesh_render_packet_equals_xla_path():
    s = load_scene("scenes/mesh.txt")
    s.camera.resolution = (32, 32)
    s.camera.derive()
    s.settings.trace_depth = 3
    r1 = Renderer(s)
    r1.render(2, seed=4)
    img_packet = r1.image()

    s.packed_meshes = ()  # force the XLA fallback
    r2 = Renderer(s)
    r2.render(2, seed=4)
    img_xla = r2.image()
    np.testing.assert_allclose(img_packet, img_xla, atol=1e-5)
