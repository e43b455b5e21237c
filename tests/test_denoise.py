"""Edge-avoiding à-trous denoiser (render/denoise.py): noise reduction,
edge preservation, shift correctness, and Renderer/CLI wiring."""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from project3_cuda_path_tracer_tpu import load_scene
from project3_cuda_path_tracer_tpu.render import denoise as dn
from project3_cuda_path_tracer_tpu.render.integrator import Renderer


def test_shift_edge_clamp():
    a = jnp.arange(12.0).reshape(3, 4, 1)
    s = np.asarray(dn._shift(a, 1, 0))  # content moves down, top row clamps
    np.testing.assert_array_equal(s[1, :, 0], np.asarray(a)[0, :, 0])
    np.testing.assert_array_equal(s[0, :, 0], np.asarray(a)[0, :, 0])
    s = np.asarray(dn._shift(a, 0, -2))  # content moves left
    np.testing.assert_array_equal(s[:, 0, 0], np.asarray(a)[:, 2, 0])
    np.testing.assert_array_equal(s[:, 3, 0], np.asarray(a)[:, 3, 0])


def test_flat_region_noise_shrinks_edges_survive():
    """Two constant half-planes with different normals + additive noise:
    the filter must cut in-region noise hard without mixing the halves."""
    rng = np.random.default_rng(0)
    h = w = 64
    clean = np.zeros((h, w, 3), np.float32)
    clean[:, : w // 2] = 0.2
    clean[:, w // 2:] = 0.9
    noisy = clean + rng.normal(0, 0.12, clean.shape).astype(np.float32)
    normal = np.zeros((h, w, 3), np.float32)
    normal[:, : w // 2, 1] = 1.0
    normal[:, w // 2:, 0] = 1.0
    pos = np.zeros((h, w, 3), np.float32)
    pos[..., 0] = np.arange(w)[None, :] * 0.02
    pos[..., 2] = np.arange(h)[:, None] * 0.02
    out = np.asarray(dn.atrous_denoise(jnp.asarray(noisy),
                                       jnp.asarray(normal),
                                       jnp.asarray(pos)))
    err_in = np.abs(out - clean)[:, 4:w // 2 - 4].mean()
    err_noisy = np.abs(noisy - clean)[:, 4:w // 2 - 4].mean()
    assert err_in < 0.35 * err_noisy            # flat regions smoothed
    left = out[:, w // 2 - 1].mean()
    right = out[:, w // 2].mean()
    assert right - left > 0.55                  # the edge survives


def test_renderer_denoise_improves_low_spp(tmp_path):
    """4-spp cornell denoised must land closer to a 160-spp reference
    than raw 4-spp does (the point of the Project-4 extension)."""
    s = load_scene("/root/reference/scenes/cornell.txt")
    s.camera.resolution = (64, 64)
    s.camera.derive()
    s.settings.trace_depth = 4
    ref_r = Renderer(s)
    ref_r.render(160, seed=3)
    ref = ref_r.image()
    low = Renderer(s)
    low.render(4, seed=7)
    raw = low.image()
    den = low.denoised_accum()[:, ::-1, :] / 4
    rmse_raw = float(np.sqrt(((raw - ref) ** 2).mean()))
    rmse_den = float(np.sqrt(((den - ref) ** 2).mean()))
    assert rmse_den < 0.6 * rmse_raw, (rmse_den, rmse_raw)
    # save path writes a file
    out = low.save(str(tmp_path / "dn"), denoise=True)
    assert out.endswith(".png")


def test_cli_flag_parses():
    from project3_cuda_path_tracer_tpu.app.cli import build_parser
    args = build_parser().parse_args(["scene.txt", "--denoise"])
    assert args.denoise
