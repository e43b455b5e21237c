"""Measure the allocation-optimality gap of per-shard adaptive plans.

plan_epoch_sharded equalizes the path budget across the `ndev` row
blocks (each shard keeps exactly H*W/ndev paths so the radiance scatter
stays shard-local under shard_map); the global planner can move budget
between blocks. This script quantifies what that locality constraint
costs, on real error images from real low-spp renders.

Objective: after the epoch gives pixel p `n_p` extra samples, its
mean-variance is ~ err_p^2 * c_p / (c_p + n_p) where c_p is the existing
count; we report J(n) = sum_p err_p^2 * c_p / (c_p + n_p) for the
global vs per-shard apportionments (lower = better), plus the
infinite-budget proxy sum err_p^2 / n_p on the allocated-only view.

Run: PYTHONPATH=. JAX_PLATFORMS=cpu python tools/exp_shard_plan_gap.py
"""
import numpy as np

from project3_cuda_path_tracer_tpu import load_scene
from project3_cuda_path_tracer_tpu.render import adaptive as A
from project3_cuda_path_tracer_tpu.render import integrator as I
from project3_cuda_path_tracer_tpu.scene import types as T


def err_image_from_render(scene_path: str, res: int, spp: int):
    s = load_scene(scene_path)
    s.camera.resolution = (res, res)
    s.camera.derive()
    s.settings.trace_depth = 4
    st = T.RenderSettings(**{**s.settings.__dict__, "adaptive": True,
                             "adaptive_epoch": 10 ** 9})  # never replans
    r = I.Renderer(s, settings=st)
    r.render(spp)
    cnt = np.maximum(np.asarray(r.count, np.float64), 1.0)
    accum = np.asarray(r.accum, np.float64)
    accum2 = np.asarray(r.accum2, np.float64)
    lum = accum[..., 0] * 0.2126 + accum[..., 1] * 0.7152 \
        + accum[..., 2] * 0.0722
    mean = lum / cnt
    var = np.maximum(accum2 / cnt - mean ** 2, 0.0)
    g = max(lum.sum() / cnt.sum(), 1e-12)
    err = (np.sqrt(var / cnt) + 0.5 * g / cnt) / (mean + 0.1 * g + 1e-6)
    return err, cnt


def objective(err, cnt, n):
    """Predicted residual error mass after n extra samples per pixel."""
    return float((err ** 2 * cnt / (cnt + n)).sum())


def plans(err, floor_frac=0.15, ndev=8):
    h, w = err.shape
    npix = h * w
    u = err.sum() / npix
    wgt = (1.0 - floor_frac) * err + floor_frac * max(u, 1e-12)
    n_global = A.apportion(wgt, npix).reshape(h, w)
    rows = h // ndev
    blocks = [A.apportion(wgt[d * rows:(d + 1) * rows], rows * w)
              for d in range(ndev)]
    n_shard = np.concatenate(blocks).reshape(h, w)
    return n_global, n_shard


def main():
    for scene, res, spp in (("scenes/sphere.txt", 64, 16),
                            ("/root/reference/scenes/cornell.txt", 64, 16),
                            ("scenes/cornell_glass.txt", 64, 16)):
        err, cnt = err_image_from_render(scene, res, spp)
        n_g, n_s = plans(err)
        j_g = objective(err, cnt, n_g)
        j_s = objective(err, cnt, n_s)
        # how much budget the equalization actually moved
        moved = np.abs(n_g.reshape(8, -1).sum(1)
                       - n_s.reshape(8, -1).sum(1)).sum() / n_g.sum()
        print(f"{scene.split('/')[-1]:22s} J_global {j_g:10.4f}  "
              f"J_shard {j_s:10.4f}  shard/global {j_s / j_g:0.4f}  "
              f"budget moved across blocks {moved * 100:0.1f}%")


if __name__ == "__main__":
    main()
