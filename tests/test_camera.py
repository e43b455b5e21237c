"""Ray-generation tests vs the closed-form math of SURVEY §3.3
(reference: src/pathtrace.cu:122-143)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from project3_cuda_path_tracer_tpu.scene.types import Camera
from project3_cuda_path_tracer_tpu.ops.camera import generate_rays


def make_cam(**kw):
    cam = Camera(resolution=kw.pop("resolution", (8, 8)),
                 position=np.array([0, 5, 10.5], np.float32),
                 look_at=np.array([0, 5, 0], np.float32),
                 up=np.array([0, 1, 0], np.float32), **kw)
    return cam.derive()


def test_center_ray_is_view_direction():
    w = h = 8
    cam = make_cam(resolution=(w, h))
    o, d, t = generate_rays(cam.flat(), w, h, jax.random.PRNGKey(0),
                            antialias=False)
    # With AA off, pixel (x,y) uses offsets (x - W/2): pixel (4,4) is exactly
    # the optical axis.
    i = 4 + 4 * w
    np.testing.assert_allclose(np.asarray(d[i]), [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(o[i]), [0, 5, 10.5], atol=1e-6)


def test_direction_formula_matches_reference():
    """dir = normalize(view - right*plx*(x-W/2) - up*ply*(y-H/2))."""
    w, h = 6, 4
    cam = make_cam(resolution=(w, h))
    f = cam.flat()
    o, d, _ = generate_rays(f, w, h, jax.random.PRNGKey(0), antialias=False)
    x, y = 1, 3
    expect = (np.asarray(f["view"])
              - np.asarray(f["right"]) * float(f["pixel_length"][0]) * (x - w * 0.5)
              - np.asarray(f["up"]) * float(f["pixel_length"][1]) * (y - h * 0.5))
    expect /= np.linalg.norm(expect)
    np.testing.assert_allclose(np.asarray(d[x + y * w]), expect, atol=1e-6)


def test_antialias_jitters_within_pixel():
    w = h = 4
    cam = make_cam(resolution=(w, h))
    _, d0, _ = generate_rays(cam.flat(), w, h, jax.random.PRNGKey(0),
                             antialias=True)
    _, d1, _ = generate_rays(cam.flat(), w, h, jax.random.PRNGKey(1),
                             antialias=True)
    assert not np.allclose(np.asarray(d0), np.asarray(d1))
    # jitter must stay sub-pixel: every direction within one pixel_length of
    # the unjittered direction
    _, dn, _ = generate_rays(cam.flat(), w, h, jax.random.PRNGKey(0),
                             antialias=False)
    ang = np.abs(np.asarray(d0) - np.asarray(dn)).max()
    assert ang < 2.5 * float(cam.pixel_length[0])


def test_dof_keeps_focal_plane_sharp():
    w = h = 4
    cam = make_cam(resolution=(w, h), aperture=0.5, focal_distance=10.0)
    f = cam.flat()
    o, d, _ = generate_rays(f, w, h, jax.random.PRNGKey(0), antialias=False)
    o0, d0, _ = generate_rays(
        make_cam(resolution=(w, h)).flat(), w, h, jax.random.PRNGKey(0),
        antialias=False)
    # origins jittered on the lens disk
    assert not np.allclose(np.asarray(o), np.asarray(o0))
    r = np.linalg.norm(np.asarray(o) - np.asarray(o0), axis=-1)
    assert (r <= 0.5 + 1e-5).all()
    # all rays through a pixel converge at its focal-plane point
    i = 5
    p = np.asarray(o[i]) + 10.0 / np.asarray(d[i] @ d0[i]) * 0  # noqa
    focus_a = np.asarray(o0[i]) + np.asarray(d0[i]) * 10.0
    # solve t so that o + t*d is closest to focus_a
    t = np.dot(focus_a - np.asarray(o[i]), np.asarray(d[i]))
    closest = np.asarray(o[i]) + t * np.asarray(d[i])
    np.testing.assert_allclose(closest, focus_a, atol=1e-4)


def test_motion_blur_times():
    w = h = 4
    cam = make_cam(resolution=(w, h), shutter=0.7)
    _, _, t = generate_rays(cam.flat(), w, h, jax.random.PRNGKey(0),
                            antialias=False)
    t = np.asarray(t)
    assert (t >= 0).all() and (t <= 0.7).all()
    assert t.std() > 0.05
    cam0 = make_cam(resolution=(w, h))
    _, _, t0 = generate_rays(cam0.flat(), w, h, jax.random.PRNGKey(0),
                             antialias=False)
    np.testing.assert_allclose(np.asarray(t0), 0.0)
