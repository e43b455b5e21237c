"""Transform-builder unit tests (SURVEY §7 step 1: verify vs hand-computed
matrices; reference semantics: src/utilities.cpp:65-72, T*Rx*Ry*Rz*S in
degrees)."""
import numpy as np

from project3_cuda_path_tracer_tpu.utils import math as m


def test_translate_scale_compose():
    t = m.build_transformation_matrix((1, 2, 3), (0, 0, 0), (2, 4, 8))
    p = t @ np.array([1.0, 1.0, 1.0, 1.0])
    np.testing.assert_allclose(p[:3], [3, 6, 11], rtol=1e-6)


def test_rotation_x_90():
    t = m.build_transformation_matrix((0, 0, 0), (90, 0, 0), (1, 1, 1))
    p = t @ np.array([0.0, 1.0, 0.0, 1.0])
    np.testing.assert_allclose(p[:3], [0, 0, 1], atol=1e-6)


def test_rotation_order_is_x_then_y_then_z():
    # T*Rx*Ry*Rz*S applied to a vector applies Rz first.
    t = m.build_transformation_matrix((0, 0, 0), (90, 90, 0), (1, 1, 1))
    ref = m.rotate_x(90) @ m.rotate_y(90)
    np.testing.assert_allclose(t, ref.astype(np.float32), atol=1e-6)


def test_inverse_roundtrip():
    t = m.build_transformation_matrix((3, -1, 2), (10, 20, 30), (2, 3, 4))
    inv = m.inverse(t)
    np.testing.assert_allclose(t @ inv, np.eye(4), atol=1e-5)


def test_inverse_transpose_rotates_normals():
    # A non-uniform scale must NOT preserve raw-direction transforms for
    # normals; inv-transpose must. Plane x+y=const scaled by (2,1,1):
    t = m.build_transformation_matrix((0, 0, 0), (0, 0, 0), (2, 1, 1))
    it = m.inverse_transpose(t)
    n = it[:3, :3] @ np.array([1.0, 1.0, 0.0])
    n /= np.linalg.norm(n)
    # surface tangent (2,-1,0) in world must be orthogonal to n
    assert abs(n @ np.array([2.0, -1.0, 0.0])) < 1e-6


def test_normalize():
    v = m.normalize([3.0, 0.0, 4.0])
    np.testing.assert_allclose(v, [0.6, 0.0, 0.8], rtol=1e-6)
