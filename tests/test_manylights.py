"""Many-light scaling path (round 5): batched sphere intersection,
gather-based material fetch, and the 256-emitter scene end-to-end.

The per-geom intersection unroll and the per-material chained-select
fetch are both O(count) in XLA graph size — fine for ordinary scenes,
fatal at many-light scale (the round-4 probe measured >50 min of compile
at just 64 statically-unrolled lights). Above static thresholds the
framework switches to count-independent forms:
  * ops/wavefront._batched_spheres_planar — blocked lax.scan over a
    center+radius table (TraceConfig.sphere_batch),
  * ops/wavefront._mat_select gather form (> MAT_UNROLL_MAX materials),
  * ops/nee._sample_lights_gather (> UNROLL_MAX_FACES faces; round 4).
These tests pin the batched/unrolled equivalence and prove the 256-light
scene (258 geoms, 258 materials) builds and renders.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from project3_cuda_path_tracer_tpu import load_scene
from project3_cuda_path_tracer_tpu.ops import wavefront as wf
from project3_cuda_path_tracer_tpu.ops.vec import V3
from project3_cuda_path_tracer_tpu.render import integrator as I
from project3_cuda_path_tracer_tpu.scene import types as T


def test_batched_sphere_intersector_matches_unroll():
    """The world-space batched quadratic must agree with the per-geom
    object-space path on hit/miss decisions, t, normals, material ids,
    and the interior flip (different arithmetic — tolerance, not
    bitwise)."""
    s = load_scene("scenes/manylights.txt")
    types = np.asarray(s.geoms.type)
    spheres = tuple(int(g) for g in np.nonzero(types == T.SPHERE)[0])
    assert len(spheres) >= 9

    n = 512
    rng = np.random.default_rng(1)
    o = V3(*(jnp.asarray(rng.uniform(-10, 10, n), jnp.float32)
             for _ in range(3)))
    d_np = rng.normal(size=(n, 3))
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    d = V3(*(jnp.asarray(d_np[:, i], jnp.float32) for i in range(3)))
    times = jnp.zeros((n,), jnp.float32)
    gt = tuple(int(t) for t in types)

    ref = wf.intersect_planar(o, d, times, s.geoms, s.meshes, gt)
    bat = wf.intersect_planar(o, d, times, s.geoms, s.meshes, gt,
                              sphere_batch=spheres)
    t_r, t_b = np.asarray(ref.t), np.asarray(bat.t)
    hit_r, hit_b = t_r > 0, t_b > 0
    # grazing rays may flip at f32 tolerance; demand near-total agreement
    assert (hit_r == hit_b).mean() > 0.995
    both = hit_r & hit_b
    np.testing.assert_allclose(t_b[both], t_r[both], rtol=1e-3, atol=1e-3)
    same_mat = np.asarray(ref.mat_id)[both] == np.asarray(bat.mat_id)[both]
    assert same_mat.mean() > 0.995
    for a, b in ((ref.normal.x, bat.normal.x), (ref.normal.y, bat.normal.y),
                 (ref.normal.z, bat.normal.z)):
        np.testing.assert_allclose(np.asarray(b)[both & same_hit_mask(ref, bat)],
                                   np.asarray(a)[both & same_hit_mask(ref, bat)],
                                   atol=2e-3)
    assert (np.asarray(ref.outside)[both] == np.asarray(bat.outside)[both]).mean() > 0.995


def same_hit_mask(ref, bat):
    """Lanes where both paths picked the same geom (normals only
    comparable there)."""
    return np.asarray(ref.mat_id) == np.asarray(bat.mat_id)


def test_manylights_render_batched_matches_unrolled():
    """End-to-end render of the 12-light scene with the batch forced off
    vs the default (on): images must agree statistically (same estimator,
    different intersector arithmetic)."""
    s = load_scene("scenes/manylights.txt")
    s.camera.resolution = (32, 32)
    s.camera.derive()
    s.settings.trace_depth = 3
    r_on = I.Renderer(s)
    assert len(r_on.cfg.sphere_batch) >= 9   # default: batched
    r_on.render(4)
    img_on = r_on.image()

    import dataclasses
    r_off = I.Renderer(s)
    r_off.cfg = dataclasses.replace(r_off.cfg, sphere_batch=())
    r_off._baked_chunk = (r_off._build_baked_chunk()
                         if r_off._baked_chunk is not None else None)
    r_off.reset()
    r_off.render(4)
    img_off = r_off.image()
    assert np.isfinite(img_on).all()
    assert abs(float(img_on.mean()) - float(img_off.mean())) < 0.02
    # pixelwise: only isolated grazing-lane flips may differ
    close = np.isclose(img_on, img_off, rtol=1e-3, atol=1e-3).mean()
    assert close > 0.98


@pytest.mark.slow
def test_manylights256_renders_with_ris():
    """The 256-emitter / 258-material / 258-geom scene must build its
    dynamic tables (CDF-gather sampler, material gathers, batched
    spheres) and render finite non-black images with RIS direct
    lighting. Implicitly also a compile-scaling guard: the static-unroll
    form of ANY of those paths would not finish compiling."""
    s = load_scene("scenes/manylights256.txt")
    s.camera.resolution = (32, 32)
    s.camera.derive()
    s.settings.trace_depth = 3
    st = T.RenderSettings(**{**s.settings.__dict__,
                             "nee": True, "nee_ris": 4})
    r = I.Renderer(s, settings=st)
    assert len(r.cfg.sphere_batch) == 256
    assert len(r.cfg.nee_lights) == 256
    assert r.cfg.nee and r.cfg.nee_ris == 4
    r.render(2)
    img = r.image()
    assert np.isfinite(img).all()
    assert img.mean() > 0.0


def test_mat_select_gather_matches_unroll():
    """_mat_select's gather form (large M) must agree exactly with the
    unrolled form on the same table."""
    rng = np.random.default_rng(0)
    m = wf.MAT_UNROLL_MAX + 8
    tab1 = jnp.asarray(rng.uniform(0, 1, m).astype(np.float32))
    tab3 = jnp.asarray(rng.uniform(0, 1, (m, 3)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, m, 257), jnp.int32)
    got1 = wf._mat_select(tab1, ids)
    want1 = np.asarray(tab1)[np.asarray(ids)]
    np.testing.assert_array_equal(np.asarray(got1), want1)
    got3 = wf._mat_select(tab3, ids)
    want3 = np.asarray(tab3)[np.asarray(ids)]
    np.testing.assert_array_equal(
        np.stack([np.asarray(got3.x), np.asarray(got3.y),
                  np.asarray(got3.z)], -1), want3)
