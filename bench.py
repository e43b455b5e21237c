"""Canonical benchmark: forward rays/s on Cornell 800x800 depth-8.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md: "published": {}), so this
run *establishes* the baseline; vs_baseline is reported relative to the
first recorded value in BASELINE.md's target table (1.0 = parity with our
own round-1 number).
"""
from __future__ import annotations

import json
import sys
import time

WIDTH = HEIGHT = 800
DEPTH = 8
WARMUP_ITERS = 2
TIMED_ITERS = 20

# Round-1 recorded value (path segments/s, fwd). Update when re-baselined.
ROUND1_BASELINE = None  # set after first bench run on real hardware


def main() -> int:
    import jax
    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.render.integrator import Renderer

    scene = load_scene("scenes/cornell.txt")
    assert scene.camera.resolution == (WIDTH, HEIGHT)
    scene.settings.trace_depth = DEPTH

    r = Renderer(scene)
    for _ in range(WARMUP_ITERS):
        r.step()
    r.accum.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(TIMED_ITERS):
        r.step()
    r.accum.block_until_ready()
    dt = time.perf_counter() - t0

    rays_per_s = TIMED_ITERS * WIDTH * HEIGHT * DEPTH / dt
    vs = rays_per_s / ROUND1_BASELINE if ROUND1_BASELINE else 1.0
    print(json.dumps({
        "metric": "cornell_800x800_depth8_fwd_path_segments_per_s",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
