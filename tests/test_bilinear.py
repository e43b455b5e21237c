"""Bilinear texture/env filtering (--bilinear): corner-index math,
constant-texture invariance, and smoothness on a gradient atlas."""
import numpy as np
import jax.numpy as jnp
import pytest

from project3_cuda_path_tracer_tpu import load_scene
from project3_cuda_path_tracer_tpu.ops import wavefront as wf
from project3_cuda_path_tracer_tpu.render import integrator as I
from project3_cuda_path_tracer_tpu.scene import types as T
from project3_cuda_path_tracer_tpu.utils import image as img_io


def _textures(atlas8):
    """Single-material Textures with a packed atlas."""
    h, w = atlas8.shape[:2]
    atlas = atlas8.astype(np.float32) / 255.0
    return T.Textures(
        atlas=jnp.asarray(atlas),
        rect=jnp.asarray([[0, 0, w, h]], jnp.int32),
        tex_id=jnp.asarray([0], jnp.int32),
        env=jnp.zeros((1, 1, 3), jnp.float32),
        env_enabled=jnp.zeros(()),
        checker_scale=jnp.zeros((1,)),
        checker_color2=jnp.zeros((1, 3)),
        sky=jnp.zeros((14,)),
        atlas_packed=jnp.asarray(img_io.pack_rgb8(atlas)),
        env_packed=jnp.zeros((1,), jnp.uint32),
        env_alias=jnp.zeros((1,), jnp.int32),
        env_prob=jnp.zeros((1,), jnp.float32),
        bump=jnp.zeros((1, 2)), nrm_id=jnp.asarray([-1], jnp.int32),
        nrm_rect=jnp.zeros((1, 4), jnp.int32),
    )


def _fetch_bilinear(tx, u, v):
    mid = jnp.zeros(u.shape, jnp.int32)
    a00, a10, a01, a11, fu, fv, textured = wf._atlas_bilinear_indices(
        tx, mid, jnp.asarray(u), jnp.asarray(v))
    cs = [wf._unpack_rgb8(jnp.take(tx.atlas_packed, i))
          for i in (a00, a10, a01, a11)]
    out = wf._bilerp(*cs, fu, fv)
    return np.asarray(out.x)


def test_bilinear_interpolates_gradient():
    """A horizontal 0..255 ramp: fetching between texel centers must give
    the midpoint, exactly what nearest cannot."""
    w = 8
    atlas8 = np.zeros((4, w, 3), np.uint8)
    atlas8[:, :, 0] = (np.arange(w) * 255 // (w - 1))[None, :]
    tx = _textures(atlas8)
    # u halfway between texel centers 2 and 3: value = mean of the two
    u = np.array([(2.5 + 0.5) / w], np.float32)
    v = np.array([0.5], np.float32)
    got = _fetch_bilinear(tx, u, v)[0]
    want = 0.5 * (atlas8[0, 2, 0] + atlas8[0, 3, 0]) / 255.0
    assert got == pytest.approx(want, abs=1e-3)
    # exactly at a texel center: the texel value itself
    u = np.array([(2.0 + 0.5) / w], np.float32)
    got = _fetch_bilinear(tx, u, v)[0]
    assert got == pytest.approx(atlas8[0, 2, 0] / 255.0, abs=1e-3)


def test_bilinear_constant_texture_invariant():
    atlas8 = np.full((4, 4, 3), 137, np.uint8)
    tx = _textures(atlas8)
    rng = np.random.default_rng(0)
    u = rng.uniform(0, 1, 64).astype(np.float32)
    v = rng.uniform(0, 1, 64).astype(np.float32)
    got = _fetch_bilinear(tx, u, v)
    assert np.allclose(got, 137 / 255.0, atol=1e-3)


def test_bilinear_render_smoke():
    """textured_env renders with --bilinear and stays statistically close
    to nearest (same scene, same seed; filtering only smooths texels)."""
    s = load_scene("scenes/textured_env.txt")
    s.camera.resolution = (32, 32)
    s.camera.derive()
    s.settings.trace_depth = 3

    def render(**kw):
        st = T.RenderSettings(**{**s.settings.__dict__, **kw})
        r = I.Renderer(s, settings=st)
        r.render(4)
        return r.image()

    a = render()
    b = render(bilinear=True)
    assert np.isfinite(b).all()
    assert abs(float(a.mean()) - float(b.mean())) < 0.03
    assert not np.array_equal(a, b)   # it actually filtered


def _with_pair(tx, atlas8):
    import dataclasses
    atlas = atlas8.astype(np.float32) / 255.0
    return dataclasses.replace(
        tx, atlas_pair=jnp.asarray(img_io.pack_565_pair(atlas).reshape(-1)))


def _fetch_fast(tx, u, v):
    mid = jnp.zeros(u.shape, jnp.int32)
    a00, _, a01, _, fu, fv, textured = wf._atlas_bilinear_indices(
        tx, mid, jnp.asarray(u), jnp.asarray(v))
    c00, c10 = wf._unpack_565pair(jnp.take(tx.atlas_pair, a00))
    c01, c11 = wf._unpack_565pair(jnp.take(tx.atlas_pair, a01))
    out = wf._bilerp(c00, c10, c01, c11, fu, fv)
    return np.asarray(out.x)


def test_bilinear_fast_matches_exact_within_565(  ):
    """The 2-gather RGB565 pair path must agree with the exact 4-gather
    bilinear fetch to within the 565 quantization step everywhere,
    including the rect edges (left-edge fu clamp, right-edge pair
    clamp)."""
    rng = np.random.default_rng(3)
    atlas8 = rng.integers(0, 256, (8, 8, 3), np.uint8)
    tx = _with_pair(_textures(atlas8), atlas8)
    u = np.concatenate([rng.uniform(0, 1, 256),
                        [0.0, 1e-4, 0.999, 1.0 - 1e-7]]).astype(np.float32)
    v = np.concatenate([rng.uniform(0, 1, 256),
                        [0.0, 0.5, 1e-4, 0.999]]).astype(np.float32)
    exact = _fetch_bilinear(tx, u, v)
    fast = _fetch_fast(tx, u, v)
    # R channel quantizes at 1/31; lerp cannot amplify the per-corner error
    assert np.max(np.abs(exact - fast)) <= 1.0 / 31.0 + 1e-6


def test_bilinear_fast_interpolates_gradient():
    """Same midpoint check as the exact path: fast bilinear still lands
    between texels (it really filters, not a nearest fallback)."""
    w = 8
    atlas8 = np.zeros((4, w, 3), np.uint8)
    atlas8[:, :, 0] = (np.arange(w) * 255 // (w - 1))[None, :]
    tx = _with_pair(_textures(atlas8), atlas8)
    u = np.array([(2.5 + 0.5) / w], np.float32)
    v = np.array([0.5], np.float32)
    got = _fetch_fast(tx, u, v)[0]
    want = 0.5 * (atlas8[0, 2, 0] + atlas8[0, 3, 0]) / 255.0
    assert got == pytest.approx(want, abs=1.0 / 31.0)


def test_bilinear_fast_render_matches_exact():
    """textured_env end-to-end: --bilinear-fast must track the exact
    --bilinear render to texel-quantization tolerance (fused path: RGB565
    atlas + NEAREST env on miss lanes — env-lit pixels may differ more,
    bounded by the env's own bilinear-vs-nearest delta)."""
    s = load_scene("scenes/textured_env.txt")
    s.camera.resolution = (32, 32)
    s.camera.derive()
    s.settings.trace_depth = 3
    # the pair plane is built LAZILY (first Renderer with bilinear_fast),
    # not at parse time — textured scenes without the flag don't pay for it
    assert s.textures.atlas_pair.shape[0] == 1

    def render(**kw):
        st = T.RenderSettings(**{**s.settings.__dict__, **kw})
        r = I.Renderer(s, settings=st)
        r.render(4)
        return r.image()

    exact = render(bilinear=True)
    fast = render(bilinear=True, bilinear_fast=True)
    assert s.textures.atlas_pair.shape[0] > 1   # lazily built + cached
    assert np.isfinite(fast).all()
    assert abs(float(exact.mean()) - float(fast.mean())) < 0.02
    assert not np.array_equal(exact, fast)


def test_env_pair_roundtrip_error_bound():
    """pack_env_pair's 12-bit shared-exponent texel pairs must decode to
    within pair_max/16 per channel (4-bit mantissa, exponent shared with
    the horizontally adjacent texel), and exactly 0 for black texels."""
    rng = np.random.default_rng(5)
    env = (rng.uniform(0, 1, (8, 16, 3)) ** 2 * 50.0).astype(np.float32)
    env[2, 3] = 0.0                      # black texel in a bright pair
    p = img_io.pack_env_pair(env)
    t0, t1 = img_io.unpack_env_pair(p)
    t0 = t0.reshape(env.shape)
    t1 = t1.reshape(env.shape)
    nxt = env[:, (np.arange(env.shape[1]) + 1) % env.shape[1]]
    pmax = np.maximum(env.max(-1), nxt.max(-1))[..., None]
    assert np.all(np.abs(t0 - env) <= pmax / 16.0 + 1e-6)
    assert np.all(np.abs(t1 - nxt) <= pmax / 16.0 + 1e-6)
    zero_rows = env.max(-1) + nxt.max(-1) == 0
    assert np.all(t0[zero_rows] == 0.0)


def test_env_pair_wraps_longitude():
    """The right neighbor of the last column must be column 0 (equirect
    longitude wrap), not a clamp."""
    env = np.zeros((2, 4, 3), np.float32)
    env[:, 0] = 7.0   # bright first column
    p = img_io.pack_env_pair(env).reshape(2, 4)
    _, t1 = img_io.unpack_env_pair(p[:, 3])
    assert np.all(np.abs(t1 - 7.0) <= 7.0 / 16.0)


def test_bilinear_fast_env_matches_exact_within_bound():
    """The 2-gather env-pair bilinear fetch must agree with the exact
    4-gather env bilinear to the encoding's error bound on every
    direction, including poles and the longitude seam."""
    import jax.numpy as jnp
    from project3_cuda_path_tracer_tpu.ops.vec import V3
    import dataclasses
    rng = np.random.default_rng(9)
    env = (rng.uniform(0, 1, (8, 16, 3)) ** 2 * 20.0).astype(np.float32)
    tx = dataclasses.replace(
        T.Textures.none(1),
        env=jnp.asarray(env), env_enabled=jnp.ones(()),
        env_packed=jnp.asarray(img_io.pack_rgbe(env)),
        env_pair=jnp.asarray(img_io.pack_env_pair(env)))
    n = 512
    d = rng.normal(size=(n, 3))
    d[:4] = [[0, 1, 0], [0, -1, 0], [1e-8, 1.0, 1e-8], [0, 0, -1]]
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dv = V3(jnp.asarray(d[:, 0], jnp.float32),
            jnp.asarray(d[:, 1], jnp.float32),
            jnp.asarray(d[:, 2], jnp.float32))
    e00, e10, e01, e11, fu, fv = wf._env_bilinear_indices(tx, dv)
    exact = wf._bilerp(*[wf._unpack_rgbe(jnp.take(tx.env_packed, i),
                                         tx.env_enabled)
                         for i in (e00, e10, e01, e11)], fu, fv)
    c00, c10 = wf._unpack_envpair(jnp.take(tx.env_pair, e00),
                                  tx.env_enabled)
    c01, c11 = wf._unpack_envpair(jnp.take(tx.env_pair, e01),
                                  tx.env_enabled)
    fast = wf._bilerp(c00, c10, c01, c11, fu, fv)
    # the lerp of per-corner errors <= max per-corner error; each corner
    # errs <= its pair_max/16 <= global max/16 (+ the RGBE error, tiny)
    bound = float(env.max()) / 16.0 + 1e-3
    for a, b in ((exact.x, fast.x), (exact.y, fast.y), (exact.z, fast.z)):
        assert float(jnp.max(jnp.abs(a - b))) <= bound


def test_bilinear_fast_env_render_improves_on_nearest():
    """End-to-end: with the env pair plane, --bilinear-fast must track the
    exact --bilinear render MORE closely than the nearest-env fast path
    did (the round-4 gap this feature closes), and stay finite."""
    s = load_scene("scenes/textured_env.txt")
    s.camera.resolution = (32, 32)
    s.camera.derive()
    s.settings.trace_depth = 3

    def render(**kw):
        st = T.RenderSettings(**{**s.settings.__dict__, **kw})
        r = I.Renderer(s, settings=st)
        r.render(4)
        return r.image()

    exact = render(bilinear=True)
    fast = render(bilinear=True, bilinear_fast=True)
    assert s.textures.env_pair.shape[0] > 1    # lazily built
    assert np.isfinite(fast).all()
    assert abs(float(exact.mean()) - float(fast.mean())) < 0.02
    assert not np.array_equal(exact, fast)


@pytest.mark.slow
def test_cli_bilinear_fast_flag(tmp_path):
    """--bilinear-fast implies --bilinear and renders end-to-end."""
    from project3_cuda_path_tracer_tpu.app.cli import build_parser, main
    args = build_parser().parse_args(["s.txt", "--bilinear-fast"])
    assert args.bilinear_fast and not args.bilinear
    import shutil, glob, os
    # textured_env at tiny res: copy the scene + assets dir reference
    out = tmp_path / "bf"
    rc = main(["scenes/textured_env.txt", "--iterations", "1",
               "--depth", "2", "--bilinear-fast", "--out", str(out)])
    assert rc == 0
    assert glob.glob(str(out) + "*.png")
