"""Native C++ library vs Python fallbacks (OBJ parse, BVH build, PNG).

Skipped when native/build/libpt_native.so hasn't been built (make -C native).
"""
import numpy as np
import pytest

from project3_cuda_path_tracer_tpu.utils import native
from project3_cuda_path_tracer_tpu.scene import bvh as B

pytestmark = pytest.mark.skipif(not native.is_available(),
                                reason="native library not built")


@pytest.fixture(scope="module")
def torus_path():
    import os
    p = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scenes", "meshes", "torus.obj")
    if not os.path.exists(p):
        pytest.skip("torus.obj not generated")
    return p


def test_parse_obj_matches_python(torus_path):
    v_n, n_n, t_n = native.parse_obj(torus_path)
    v_p, n_p, t_p = B._load_obj_py(torus_path)
    assert v_n.shape == v_p.shape
    np.testing.assert_allclose(v_n, v_p, atol=1e-6)
    np.testing.assert_allclose(n_n, n_p, atol=1e-6)
    np.testing.assert_allclose(t_n, t_p, atol=1e-6)


def test_parse_obj_index_forms(tmp_path):
    p = tmp_path / "forms.obj"
    p.write_text("""v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vn 0 0 1
vt 0.5 0.5
f 1 2 3
f 1/1 2/1 3/1
f 1//1 2//1 3//1
f 1/1/1 2/1/1 3/1/1
f -4 -3 -2 -1
""")
    v_n, n_n, t_n = native.parse_obj(str(p))
    v_p, n_p, t_p = B._load_obj_py(str(p))
    np.testing.assert_allclose(v_n, v_p, atol=1e-6)
    np.testing.assert_allclose(n_n, n_p, atol=1e-6)
    np.testing.assert_allclose(t_n, t_p, atol=1e-6)


def test_bvh_native_valid(torus_path):
    """The native BVH must be a VALID tree over the same triangles (bin
    tie-breaking may differ from Python, so compare structure invariants +
    traversal results, not arrays)."""
    import jax
    import jax.numpy as jnp
    from project3_cuda_path_tracer_tpu.ops import intersect as isect
    from project3_cuda_path_tracer_tpu.scene import types as T

    v, n, t = B._load_obj_py(torus_path)
    res_n = native.build_bvh(v, isect.LEAF_K)
    res_p = B._build_bvh_py(v)

    def mk_bundle(res):
        perm, lo, hi, start, count, skip, right = res
        vp = v[perm]
        z3 = jnp.zeros((v.shape[0], 3))
        z2 = jnp.zeros((v.shape[0], 2))
        return T.MeshBundle(
            tri_v0=jnp.asarray(vp[:, 0]),
            tri_e1=jnp.asarray(vp[:, 1] - vp[:, 0]),
            tri_e2=jnp.asarray(vp[:, 2] - vp[:, 0]),
            tri_n0=z3, tri_n1=z3, tri_n2=z3, tri_uv0=z2, tri_uv1=z2,
            tri_uv2=z2,
            node_lo=jnp.asarray(lo), node_hi=jnp.asarray(hi),
            node_right=jnp.asarray(right, jnp.int32),
            node_start=jnp.asarray(start, jnp.int32),
            node_count=jnp.asarray(count, jnp.int32),
            node_skip=jnp.asarray(skip, jnp.int32),
            mesh_root=jnp.zeros((1,), jnp.int32),
            mesh_tri_offset=jnp.zeros((1,), jnp.int32))

    perm_n = res_n[0]
    assert sorted(perm_n.tolist()) == list(range(v.shape[0]))
    counts = res_n[4]
    assert counts[counts > 0].max() <= isect.LEAF_K

    rng = np.random.default_rng(0)
    o = rng.uniform(-3, 3, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    bn = mk_bundle(res_n)
    bp = mk_bundle(res_p)
    trav = jax.jit(lambda b, o, d: isect.bvh_traverse(o, d, b,
                                                      b.mesh_root[0]))
    tn, trin, _, _ = trav(bn, jnp.asarray(o), jnp.asarray(d))
    tp, trip, _, _ = trav(bp, jnp.asarray(o), jnp.asarray(d))
    hit_n = np.asarray(trin) >= 0
    hit_p = np.asarray(trip) >= 0
    np.testing.assert_array_equal(hit_n, hit_p)
    np.testing.assert_allclose(np.asarray(tn)[hit_n],
                               np.asarray(tp)[hit_p], rtol=1e-4)


def test_png_native_matches_reader(tmp_path):
    from project3_cuda_path_tracer_tpu.utils.image import read_png
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (21, 17, 3), dtype=np.uint8)
    p = str(tmp_path / "n.png")
    assert native.write_png(p, img)
    back = read_png(p)
    np.testing.assert_allclose(back, img.astype(np.float32) / 255.0,
                               atol=1e-6)
