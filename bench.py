"""Canonical benchmark (BASELINE.json north star): forward+backward
path-segments/s per chip on Cornell 800x800 depth-8 — one differentiable
train step = render one full iteration + backprop pixel-MSE gradients into
material + camera parameters.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md: "published": {}), so round 1
*establishes* the baseline.

Ratio accounting (round-4 verdict item): the headline comparison is
``vs_prev`` — this run's scanned value over the previous round's scanned
value parsed from the newest BENCH_r{n}.json, a like-for-like ratio.
``vs_baseline`` (ratio to the round-1 recorded 3.9e7) is kept as a legacy
field but overstates: the round-1 denominator was measured under per-step
dispatch on a degraded tunnel, not the scanned methodology used since.

Schedule self-calibration (round-5 verdict item 1): round 4's headline
(546 M, builder sessions) used the unroll+no-remat trace schedule, but the
driver-captured BENCH_r04 recorded 336 M — the unrolled schedule's
advantage did not reproduce under driver conditions. Rather than hard-code
either schedule, this script now MEASURES BOTH (the unrolled-no-remat form
and the scan+save-"hits" form), reports each in the JSON
(``sched_unroll_ms`` / ``sched_scan_ms``), and takes the faster one as the
headline — the artifact self-explains whichever way the machine leans that
day, and the recorded value is the best this process could actually do.
"""
from __future__ import annotations

import glob
import json
import os
import re
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


def _prev_round_value() -> tuple[float, str] | None:
    """Scanned segs/s from the newest BENCH_r{n}.json next to this file."""
    root = os.path.dirname(os.path.abspath(__file__))
    best: tuple[int, str] | None = None
    for p in glob.glob(os.path.join(root, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), p)
    if best is None:
        return None
    try:
        with open(best[1]) as f:
            v = json.load(f)["parsed"]["value"]
        return float(v), "r%02d" % best[0]
    except (OSError, KeyError, ValueError, TypeError):
        return None


def main() -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp
    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.render.integrator import TraceConfig
    from project3_cuda_path_tracer_tpu.models.inverse import (
        RenderParams, make_train_scan, make_train_step, make_seed_history)

    scene = load_scene("scenes/cornell.txt")
    assert scene.camera.resolution == (WIDTH, HEIGHT)

    gt = tuple(int(t) for t in np.asarray(scene.geoms.type))

    def cfg_for(schedule: str) -> TraceConfig:
        # "unroll": bounce loop unrolled, remat off — the round-4
        # builder-side best at this scale (residual planes stay plain
        # live values; no scan DUS stacking, no backward recompute).
        # "scan": lax.scan over bounces + remat_save="hits" — the
        # memory-robust production schedule (the best under a scan,
        # BENCHMARKS.md round-4 remat/unroll A/B). Gradients are
        # bitwise-path-identical between the two (checked at 16^2).
        return TraceConfig(width=WIDTH, height=HEIGHT, trace_depth=DEPTH,
                           antialias=True, geom_types=gt,
                           glossy=False, sky=False,
                           unroll=(schedule == "unroll"),
                           remat=(schedule == "scan"))

    key = jax.random.PRNGKey(0)
    target = jnp.zeros((HEIGHT, WIDTH, 3), jnp.float32)

    def measure(schedule: str) -> float:
        """Best-of-3 scanned-epoch time for one trace schedule.

        Production training-loop form: TIMED_STEPS optimizer steps
        scanned inside one device program (models/inverse.
        make_train_scan) — per-step host dispatch costs ~25 ms over a
        remote-attached chip (BENCHMARKS.md "dispatch tax"). The
        history-residual step (round 4) renders ONCE per step; the
        detached MSE residual is the loop-carried EMA of past renders,
        seeded once (models/inverse.py docstring for the unbiasedness
        argument; fit-quality A/B + the shipped polish mitigation in
        BENCHMARKS.md)."""
        cfg = cfg_for(schedule)
        opt, run = make_train_scan(scene.geoms, scene.meshes,
                                   scene.textures, cfg,
                                   num_steps=TIMED_STEPS, history=True)
        params = jax.tree_util.tree_map(      # copy: the step donates
            jnp.array, RenderParams(materials=scene.materials,
                                    cam=scene.camera.flat()))
        opt_state = opt.init(params)
        seed_hist = make_seed_history(scene.geoms, scene.meshes,
                                      scene.textures, cfg)
        hist = seed_hist(params, jax.random.fold_in(key, 999))

        # warmup/compile (one full scanned epoch). Syncs use an explicit
        # host transfer (np.asarray) rather than block_until_ready: over
        # the remote-attach transport block_until_ready has been observed
        # to return before execution completes, while a value transfer
        # cannot lie.
        params, opt_state, hist, losses = run(params, opt_state, hist,
                                              key, target)
        np.asarray(losses)

        # Best of 3 epochs: the transport has multi-second latency phases
        # unrelated to device throughput; min-time is the standard
        # estimator for the machine's actual capability.
        dt = float("inf")
        for r in range(1, 4):
            t0 = time.perf_counter()
            params, opt_state, hist, losses = run(
                params, opt_state, hist, jax.random.fold_in(key, r),
                target)
            np.asarray(losses)
            dt = min(dt, time.perf_counter() - t0)
        return dt

    dt_unroll = measure("unroll")
    dt_scan = measure("scan")
    schedule = "unroll" if dt_unroll <= dt_scan else "scan"
    dt = min(dt_unroll, dt_scan)
    segs_per_s = TIMED_STEPS * WIDTH * HEIGHT * DEPTH / dt

    # Second form, same kernels: INLINE per-step dispatch (one jitted
    # train step per host round-trip), with the winning schedule.
    # Reported alongside so cross-round deltas can be attributed to
    # kernels vs dispatch conditions; the headline metric stays the
    # scanned-epoch form (fixed methodology since r1).
    cfg = cfg_for(schedule)
    opt, _ = make_train_scan(scene.geoms, scene.meshes, scene.textures,
                             cfg, num_steps=TIMED_STEPS, history=True)
    _, step = make_train_step(scene.geoms, scene.meshes, scene.textures,
                              cfg, history=True)
    params2 = jax.tree_util.tree_map(
        jnp.array, RenderParams(materials=scene.materials,
                                cam=scene.camera.flat()))
    opt_state2 = jax.tree_util.tree_map(jnp.array, opt.init(params2))
    seed_hist = make_seed_history(scene.geoms, scene.meshes,
                                  scene.textures, cfg)
    hist2 = seed_hist(params2, jax.random.fold_in(key, 998))
    params2, opt_state2, hist2, l = step(params2, opt_state2, hist2, key,
                                         target)
    np.asarray(l)
    inline_dt = float("inf")
    for r in range(5):
        t0 = time.perf_counter()
        params2, opt_state2, hist2, l = step(params2, opt_state2, hist2,
                                             jax.random.fold_in(key, 100 + r),
                                             target)
        np.asarray(l)
        inline_dt = min(inline_dt, time.perf_counter() - t0)
    inline_segs = WIDTH * HEIGHT * DEPTH / inline_dt

    out = {
        "metric": "cornell_800x800_depth8_fwdbwd_path_segments_per_s",
        "value": round(segs_per_s, 1),
        "unit": "rays/s",
    }
    prev = _prev_round_value()
    if prev is not None:
        # Headline ratio: like-for-like (scanned vs scanned, same script).
        out["vs_prev"] = round(segs_per_s / prev[0], 4)
        out["prev_round"] = prev[1]
    out.update({
        # Legacy ratio vs the round-1 per-step-dispatch number; overstates
        # (see module docstring) — kept for continuity only.
        "vs_baseline": round(segs_per_s / ROUND1_BASELINE_FWDBWD, 4),
        "scanned_ms_per_step": round(dt * 1e3 / TIMED_STEPS, 2),
        "schedule": schedule,
        "sched_unroll_ms": round(dt_unroll * 1e3 / TIMED_STEPS, 2),
        "sched_scan_ms": round(dt_scan * 1e3 / TIMED_STEPS, 2),
        "inline_ms_per_step": round(inline_dt * 1e3, 2),
        "inline_segs_per_s": round(inline_segs, 1),
    })
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
