"""Round-4 chip measurements, batched into ONE TPU process.

Produces the BENCHMARKS.md round-4 exit numbers:
  1. manylights 800^2 d5: plain NEE vs --nee-ris 4 vs --restir 4 —
     ms/iter (scanned 16-iter chunks) + RMSE@16 + direct equal-time RMSE
     (each mode renders the spp it affords in the same wall budget).
  2. manylights_glossy 800^2 d5 (glossy-dominated target): same table.
  3. textured_env 2048^2 d8: nearest vs --bilinear vs --bilinear-fast
     ms/iter (the 4-gather -> 2-gather item).

Usage: python tools/exp_r4_chip.py [--skip 1,2,3]
"""
from __future__ import annotations

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
    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.render import integrator as I
    from project3_cuda_path_tracer_tpu.scene import types as T

    print("backend:", jax.default_backend(), flush=True)

    def make(scene, **kw):
        st = T.RenderSettings(**{**scene.settings.__dict__, **kw})
        return I.Renderer(scene, settings=st)

    import jax.numpy as jnp

    def sync(x):
        # Honest execution sync with a SMALL transfer: block_until_ready
        # can return early over the axon transport (bench.py note), and
        # pulling the full 2048^2 accum costs ~0.5 s of tunnel time that
        # would masquerade as kernel time. A scalar reduction pays one
        # extra ~25 ms dispatch per EPOCH instead.
        np.asarray(jnp.sum(x))

    def ms_per_iter(scene, chunk=16, **kw):
        """Scanned-chunk wall time (dispatch-tax immune): time 2 chunks,
        report the best."""
        r = make(scene, **kw)
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
        rows = []
        ms0 = None
        for label, kw in modes:
            ms, _ = ms_per_iter(scene, **kw)
            if ms0 is None:
                ms0 = ms
            e16 = np.mean([rmse(image_of(scene, base_spp, seed=s, **kw), gt)
                           for s in (5, 9)])
            # equal-time: this mode affords base_spp * ms0/ms iterations
            # of the BASELINE budget (mode 0's 16-iter wall time)
            spp_eq = max(int(round(base_spp * ms0 / ms)), 1)
            e_eq = np.mean([rmse(image_of(scene, spp_eq, seed=s + 20, **kw),
                                 gt) for s in (5, 9)])
            rows.append({"scene": name, "mode": label,
                         "ms_per_iter": round(ms, 1),
                         "rmse@%d" % base_spp: round(e16, 4),
                         "spp_equal_time": spp_eq,
                         "rmse_equal_time": round(e_eq, 4)})
            print(json.dumps(rows[-1]), flush=True)
        return rows

    if 1 not in skip:
        s = load_scene(os.path.join(ROOT, "scenes/manylights.txt"))
        light_table(s, "manylights", [
            ("nee", dict(nee=True)),
            ("nee_ris4", dict(nee=True, nee_ris=4)),
            ("restir4", dict(restir=4)),
        ])

    if 2 not in skip:
        s = load_scene(os.path.join(ROOT, "scenes/manylights_glossy.txt"))
        light_table(s, "manylights_glossy", [
            ("nee", dict(nee=True)),
            ("nee_ris4", dict(nee=True, nee_ris=4)),
        ])

    if 3 not in skip:
        s = load_scene(os.path.join(ROOT, "scenes/textured_env.txt"))
        for label, kw in (("nearest", {}),
                          ("bilinear", dict(bilinear=True)),
                          ("bilinear_fast", dict(bilinear=True,
                                                 bilinear_fast=True))):
            ms, _ = ms_per_iter(s, chunk=4, **kw)
            print(json.dumps({"scene": "textured_env", "mode": label,
                              "ms_per_iter": round(ms, 1)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
