"""Round-5 chip measurements, resume half (exp_r5_chip.py crashed the TPU
worker mid nee_ris8 — the 16-iteration scanned chunk of the M=8 RIS
program at 800^2 x 256 lights is a ~40 s single device program over the
tunnel; this resume uses chunk=4 for the heavy modes and caches the
truth image to /tmp so a further crash resumes cheaply).

Covers: part-1 remaining modes (nee_ris8, restir4) + parts 2-4 of
tools/exp_r5_chip.py. Same tables, same methodology.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

GT_CACHE = "/tmp/r5_manylights256_gt.npy"
BASE = {"nee": dict(ms=940.2, r16=0.4305)}  # from the crashed first run


def main():
    skip = set()
    for a in sys.argv[1:]:
        if a.startswith("--skip"):
            skip = set(int(x) for x in a.split("=", 1)[1].split(","))
    import numpy as np
    import jax
    import jax.numpy as jnp
    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.render import integrator as I
    from project3_cuda_path_tracer_tpu.scene import types as T

    print("backend:", jax.default_backend(), flush=True)

    def make(scene, **kw):
        st = T.RenderSettings(**{**scene.settings.__dict__, **kw})
        return I.Renderer(scene, settings=st)

    def sync(x):
        np.asarray(jnp.sum(x))

    def ms_per_iter(scene, chunk=16, renderer=None, **kw):
        r = renderer or make(scene, **kw)
        r.step_many(chunk)
        sync(r.accum)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            r.step_many(chunk)
            sync(r.accum)
            best = min(best, time.perf_counter() - t0)
        return best * 1e3 / chunk, r

    def image_of(scene, spp, chunk=None, **kw):
        r = make(scene, **kw)
        if chunk:  # render in pieces: keep device programs short
            done = 0
            while done < spp:
                n = min(chunk, spp - done)
                r.step_many(n)
                sync(r.accum)
                done += n
        else:
            r.render(spp)
        return r.image()

    def rmse(a, b):
        return float(np.sqrt(((a - b) ** 2).mean()))

    if 1 not in skip:
        s = load_scene(os.path.join(ROOT, "scenes/manylights256.txt"))
        if os.path.exists(GT_CACHE):
            gt = np.load(GT_CACHE)
        else:
            gt = image_of(s, 384, chunk=32, nee=True)
            np.save(GT_CACHE, gt)
        ms0 = BASE["nee"]["ms"]
        for label, kw in (("nee_ris8", dict(nee=True, nee_ris=8)),
                          ("restir4", dict(restir=4))):
            ms, _ = ms_per_iter(s, chunk=4, **kw)
            e16 = np.mean([rmse(image_of(s, 16, chunk=4, seed=x, **kw), gt)
                           for x in (5, 9)])
            spp_eq = max(int(round(16 * ms0 / ms)), 1)
            e_eq = np.mean([rmse(image_of(s, spp_eq, chunk=4, seed=x + 20,
                                          **kw), gt) for x in (5, 9)])
            print(json.dumps({"scene": "manylights256", "mode": label,
                              "ms_per_iter": round(ms, 1),
                              "rmse@16": round(e16, 4),
                              "spp_equal_time": spp_eq,
                              "rmse_equal_time": round(e_eq, 4)}),
                  flush=True)

    if 2 not in skip:
        s = load_scene(os.path.join(ROOT, "scenes/manylights.txt"))
        ms_b, _ = ms_per_iter(s, nee=True)
        r = make(s, nee=True)
        r.cfg = dataclasses.replace(r.cfg, sphere_batch=())
        if r._baked_chunk is not None:
            r._baked_chunk = r._build_baked_chunk()
        r.reset()
        ms_u, _ = ms_per_iter(s, renderer=r)
        print(json.dumps({"scene": "manylights", "mode": "sphere_batch_ab",
                          "batched_ms": round(ms_b, 1),
                          "unrolled_ms": round(ms_u, 1)}), flush=True)

    if 3 not in skip:
        s = load_scene(os.path.join(ROOT, "scenes/textured_env.txt"))
        for label, kw in (("bilinear", dict(bilinear=True)),
                          ("bilinear_fast", dict(bilinear=True,
                                                 bilinear_fast=True))):
            ms, _ = ms_per_iter(s, chunk=4, **kw)
            print(json.dumps({"scene": "textured_env", "mode": label,
                              "ms_per_iter": round(ms, 1)}), flush=True)
        exact = image_of(s, 8, chunk=4, bilinear=True, seed=3)
        fast = image_of(s, 8, chunk=4, bilinear=True, bilinear_fast=True,
                        seed=3)
        print(json.dumps({"scene": "textured_env",
                          "mode": "fast_vs_exact_rmse@8",
                          "rmse": round(rmse(exact, fast), 5)}), flush=True)

    if 4 not in skip:
        s = load_scene(os.path.join(ROOT, "scenes/cornell.txt"))
        ms, _ = ms_per_iter(s)
        print(json.dumps({"scene": "cornell", "mode": "forward",
                          "ms_per_iter": round(ms, 2)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
