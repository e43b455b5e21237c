"""Round-5 chip measurements, batched into ONE TPU process.

Produces the BENCHMARKS.md round-5 numbers:
  1. manylights256 800^2 d5 (256 emitters; the many-light HOME REGIME for
     resampled direct lighting): nee vs --nee-ris 4/8 vs --restir 4 —
     ms/iter (scanned chunks) + RMSE@16 + equal-time RMSE.
  2. manylights (12 lights) 800^2 d5: batched-sphere intersector (the new
     default at >=9 spheres) vs the per-geom unroll — ms/iter A/B.
  3. textured_env 2048^2 d8: bilinear exact vs --bilinear-fast, which now
     filters the ENV through the 16-bit pair plane too — ms/iter +
     fast-vs-exact RMSE@8 (quality cost of the 2-gather encodings).
  4. cornell 800^2 d8 forward ms/iter (regression watch).

Usage: python tools/exp_r5_chip.py [--skip=1,2,3,4]
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


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
        # scalar-sum sync: block_until_ready can return early over axon;
        # a full-buffer pull would bill ~0.5 s of tunnel transfer as
        # kernel time (BENCHMARKS.md round-4 methodology note)
        np.asarray(jnp.sum(x))

    def ms_per_iter(scene, chunk=16, renderer=None, **kw):
        r = renderer or make(scene, **kw)
        r.step_many(chunk)
        sync(r.accum)            # compile + warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            r.step_many(chunk)
            sync(r.accum)
            best = min(best, time.perf_counter() - t0)
        return best * 1e3 / chunk, r

    def image_of(scene, spp, **kw):
        r = make(scene, **kw)
        r.render(spp)
        return r.image()

    def rmse(a, b):
        return float(np.sqrt(((a - b) ** 2).mean()))

    def light_table(scene, name, modes, truth_spp=384, base_spp=16):
        gt = image_of(scene, truth_spp, nee=True)
        ms0 = None
        for label, kw in modes:
            ms, _ = ms_per_iter(scene, **kw)
            if ms0 is None:
                ms0 = ms
            e16 = np.mean([rmse(image_of(scene, base_spp, seed=s, **kw), gt)
                           for s in (5, 9)])
            spp_eq = max(int(round(base_spp * ms0 / ms)), 1)
            e_eq = np.mean([rmse(image_of(scene, spp_eq, seed=s + 20, **kw),
                                 gt) for s in (5, 9)])
            print(json.dumps({"scene": name, "mode": label,
                              "ms_per_iter": round(ms, 1),
                              "rmse@%d" % base_spp: round(e16, 4),
                              "spp_equal_time": spp_eq,
                              "rmse_equal_time": round(e_eq, 4)}),
                  flush=True)

    if 1 not in skip:
        s = load_scene(os.path.join(ROOT, "scenes/manylights256.txt"))
        light_table(s, "manylights256", [
            ("nee", dict(nee=True)),
            ("nee_ris4", dict(nee=True, nee_ris=4)),
            ("nee_ris8", dict(nee=True, nee_ris=8)),
            ("restir4", dict(restir=4)),
        ])

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
        exact = image_of(s, 8, bilinear=True, seed=3)
        fast = image_of(s, 8, bilinear=True, bilinear_fast=True, seed=3)
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
