"""SDF/CSG implicit primitives (ops/sdf.py) — the reference TODO's
alternative primitive slots ("metaball? CSG?", reference
src/pathtrace.cu:188). Analytic intersection checks against closed forms,
CSG boundary semantics, normals, and an end-to-end render through the
scene grammar."""
import os
import textwrap

import numpy as np
import jax.numpy as jnp
import pytest

from project3_cuda_path_tracer_tpu import load_scene
from project3_cuda_path_tracer_tpu.ops import sdf as S
from project3_cuda_path_tracer_tpu.ops import wavefront as wf
from project3_cuda_path_tracer_tpu.ops.vec import V3
from project3_cuda_path_tracer_tpu.render.integrator import Renderer
from project3_cuda_path_tracer_tpu.scene import types as T


def _v3(*pts):
    a = np.array(pts, np.float32)
    return V3(jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]),
              jnp.asarray(a[:, 2]))


def _march(origin, direction, kind, params):
    o = _v3(origin)
    d = _v3(direction)
    p = jnp.asarray(np.asarray(params + [0.0] * (20 - len(params)),
                               np.float32))
    t, hit, outside = S.march_local(o, d, kind, p)
    return float(t[0]), bool(hit[0]), bool(outside[0])


def test_torus_axis_hit():
    # Torus R=0.35 r=0.1 in the xz plane; ray along -x hits the outer rim
    # at x = -(R + r).
    t, hit, outside = _march((-2, 0, 0), (1, 0, 0), (S.TORUS, -1, -1),
                             [0.35, 0.1])
    assert hit and outside
    assert abs(t - (2.0 - 0.45)) < 5e-3


def test_torus_center_miss():
    # Straight through the hole: the +y axis through the center misses.
    t, hit, _ = _march((0, -2, 0), (0, 1, 0), (S.TORUS, -1, -1),
                       [0.35, 0.1])
    assert not hit


def test_roundbox_face_hit():
    # Rounded box h=(0.4,0.4,0.4) r=0.1: a face-center hit is at 0.4.
    t, hit, _ = _march((0, 0, -3), (0, 0, 1), (S.ROUNDBOX, -1, -1),
                       [0.4, 0.4, 0.4, 0.1])
    assert hit and abs(t - (3.0 - 0.4)) < 5e-3


def test_capsule_side_hit():
    t, hit, _ = _march((-2, 0.2, 0), (1, 0, 0), (S.CAPSULE, -1, -1),
                       [0.3, 0.25])
    assert hit and abs(t - (2.0 - 0.25)) < 5e-3


def test_metaball_bridges_between_balls():
    # Two r=0.2 balls at x=+-0.3 with a strong blend: the midpoint between
    # them is INSIDE the blended surface even though it is outside both
    # balls individually (the defining metaball behavior).
    # smin at the midpoint: both sphere fields are +0.1, so
    # smin = 0.1 - k/4 — negative (bridged) once k > 0.4.
    params = [0.5,                # blend k
              -0.3, 0.0, 0.0, 0.2,
              0.3, 0.0, 0.0, 0.2]
    kind = (S.METABALL, 2, -1)
    p = jnp.asarray(np.asarray(params + [0.0] * 11, np.float32))
    d_mid = float(S.sdf_eval(_v3((0, 0, 0)), kind, p)[0])
    assert d_mid < 0.0
    d_ball = float(S.sdf_eval(_v3((0.45, 0, 0)), kind, p)[0])
    assert d_ball < 0.0          # inside the right ball
    d_out = float(S.sdf_eval(_v3((0, 1.0, 0)), kind, p)[0])
    assert d_out > 0.0
    # And a ray from above the midpoint hits the blended bridge.
    t, hit, _ = _march((0, -2, 0), (0, 1, 0), kind, params)
    assert hit and t < 2.0


def test_csg_diff_carves_dimple():
    # Cube h=0.5 minus a sphere r=0.6 centered on the -x face: the axis ray
    # passes through the carved bowl and hits the sphere's far shell at
    # x = 0.1 (|x - (-0.5)| = 0.6).
    params = [0, 0, 0, 0.5, 0.5, 0.5, 0, 0,     # A: box c=(0), h=(0.5)
              -0.5, 0, 0, 0.6]                   # B: sphere c=(-0.5,0,0)
    t, hit, _ = _march((-3, 0, 0), (1, 0, 0),
                       (S.CSG_DIFF, S.SUB_BOX, S.SUB_SPHERE), params)
    assert hit and abs(t - 3.1) < 5e-3
    # Off-axis (outside the carve) the cube face is intact at x=-0.5.
    t2, hit2, _ = _march((-3, 0.45, 0.45), (1, 0, 0),
                         (S.CSG_DIFF, S.SUB_BOX, S.SUB_SPHERE), params)
    assert hit2 and abs(t2 - 2.5) < 5e-3


def test_csg_inter_lens():
    # Intersection of two offset spheres r=0.5 at x=+-0.25: the lens spans
    # x in [-0.25, 0.25] on the axis.
    params = [-0.25, 0, 0, 0.5, 0, 0, 0, 0,
              0.25, 0, 0, 0.5]
    t, hit, _ = _march((-2, 0, 0), (1, 0, 0),
                       (S.CSG_INTER, S.SUB_SPHERE, S.SUB_SPHERE), params)
    assert hit and abs(t - 1.75) < 5e-3


def test_csg_union_nearest():
    params = [-0.6, 0, 0, 0.3, 0, 0, 0, 0,
              0.6, 0, 0, 0.3]
    t, hit, _ = _march((-3, 0, 0), (1, 0, 0),
                       (S.CSG_UNION, S.SUB_SPHERE, S.SUB_SPHERE), params)
    assert hit and abs(t - 2.1) < 5e-3


def test_interior_march_and_outside_flag():
    # Ray starting inside a torus tube marches to the inner wall and
    # reports outside=False.
    t, hit, outside = _march((0.35, 0, 0), (1, 0, 0), (S.TORUS, -1, -1),
                             [0.35, 0.1])
    assert hit and not outside
    assert abs(t - 0.1) < 5e-3


def test_normals_match_analytic_sphere():
    # CSG union of one sphere = that sphere; tetrahedral FD normal should
    # match the analytic radial normal.
    params = [0, 0, 0, 0.5, 0, 0, 0, 0,
              0, 0, 0, 0.5]
    kind = (S.CSG_UNION, S.SUB_SPHERE, S.SUB_SPHERE)
    p = jnp.asarray(np.asarray(params + [0.0] * 8, np.float32))
    pts = [(0.5, 0, 0), (0, 0.5, 0), (0.3, 0.4, 0)]
    n = S.normal_local(_v3(*pts), kind, p)
    got = np.stack([np.asarray(n.x), np.asarray(n.y), np.asarray(n.z)], -1)
    want = np.array(pts, np.float32)
    want /= np.linalg.norm(want, axis=-1, keepdims=True)
    np.testing.assert_allclose(got, want, atol=1e-3)


SDF_SCENE = textwrap.dedent("""\
    MATERIAL 0
    RGB         1 1 1
    SPECEX      0
    SPECRGB     0 0 0
    REFL        0
    REFR        0
    REFRIOR     0
    EMITTANCE   5

    MATERIAL 1
    RGB         .7 .3 .9
    SPECEX      0
    SPECRGB     0 0 0
    REFL        0
    REFR        0
    REFRIOR     0
    EMITTANCE   1

    CAMERA
    RES         64 64
    FOVY        45
    ITERATIONS  8
    DEPTH       4
    FILE        sdftest
    EYE         0 1 4
    LOOKAT      0 0 0
    UP          0 1 0

    OBJECT 0
    cube
    material 0
    TRANS       0 4 0
    ROTAT       0 0 0
    SCALE       3 .3 3

    OBJECT 1
    sdf torus
    material 1
    PARAMS      0.35 0.12
    TRANS       0 0 0
    ROTAT       90 0 0
    SCALE       2 2 2
    """)


def test_sdf_scene_renders(tmp_path):
    path = tmp_path / "sdf.txt"
    path.write_text(SDF_SCENE)
    scene = load_scene(str(path))
    assert tuple(np.asarray(scene.geoms.type)) == (T.CUBE, T.SDF)
    assert scene.sdf_kinds == ((-1, -1, -1), (S.TORUS, -1, -1))
    np.testing.assert_allclose(
        np.asarray(scene.geoms.sdf_params)[1, :2], [0.35, 0.12])

    r = Renderer(scene)
    r.render(8, seed=3)
    img = r.image()
    assert np.isfinite(img).all()
    # The emissive torus ring is visible and purple-ish (blue > green),
    # and the camera sees straight through the hole at the center.
    center = img[20:44, 20:44]
    assert center.mean() > 0.05
    assert center[..., 2].mean() > center[..., 1].mean()
    assert img[31:33, 31:33].mean() < center.mean() * 0.5


def test_sdf_world_distance_under_scale():
    """Non-uniform object scale: t must still be WORLD distance
    (src/intersections.h:87,143 semantics), matching an equivalent
    analytic sphere. CSG union of a single centered sphere r=0.5 == the
    canonical unit sphere, scaled 2x in world."""
    mats = T.Materials.default(1) if hasattr(T.Materials, "default") else None
    tr = np.eye(4, dtype=np.float32)
    tr[0, 0] = tr[1, 1] = tr[2, 2] = 2.0     # uniform scale 2
    inv = np.linalg.inv(tr)
    params = np.zeros((1, 20), np.float32)
    params[0, :4] = [0, 0, 0, 0.5]
    params[0, 8:12] = [0, 0, 0, 0.5]
    geoms = T.Geoms(
        type=jnp.array([T.SDF], jnp.int32),
        material_id=jnp.array([0], jnp.int32),
        transform=jnp.asarray(tr[None]),
        inverse_transform=jnp.asarray(inv[None]),
        inverse_transpose=jnp.asarray(inv.T[None]),
        velocity=jnp.zeros((1, 3), jnp.float32),
        mesh_id=jnp.array([-1], jnp.int32),
        sdf_params=jnp.asarray(params),
    )
    o = _v3((0, 0, -5))
    d = _v3((0, 0, 1))
    hit = wf.intersect_planar(
        o, d, jnp.zeros((1,), jnp.float32), geoms, T.MeshBundle.empty(),
        (T.SDF,), sdf_kinds=((S.CSG_UNION, S.SUB_SPHERE, S.SUB_SPHERE),))
    # world-space sphere radius 1 at origin: hit at t = 4 (minus eps)
    assert abs(float(hit.t[0]) - 4.0) < 1e-2
    assert float(hit.normal.z[0]) < -0.999
