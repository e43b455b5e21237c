"""Roofline / MFU accounting for the cornell pipeline (BASELINE's
"fwd+bwd rays/s roofline per chip" made arithmetic, not belief).

Method: XLA's own cost model (`compiled.cost_analysis()`) counts the
FLOPs and HBM bytes of the exact compiled programs — the forward
progressive step and the fwd+bwd train step — on the current backend.
Those counts, divided by measured wall time, give achieved FLOP/s and
bytes/s; dividing by the chip peaks gives the fraction-of-roof and tells
which roof (compute vs memory) binds.

v5e peaks used (public figures):
  * HBM bandwidth:  819 GB/s
  * MXU bf16:       197 TFLOP/s  (unused here — the path tracer issues no
                    matmuls; its compute runs on the VPU)
  * VPU fp32:       ~3.9 TFLOP/s (8x128 lanes x 4 ALU slots x ~0.94 GHz;
                    TPU vector units are not publicly specced per-op — this
                    is the standard estimate from the scaling-book hardware
                    chapter and is marked as such in the output)

Run on the TPU (one process):  python tools/roofline.py
"""
from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

HBM_PEAK = 819e9
VPU_PEAK = 3.9e12
MXU_PEAK_BF16 = 197e12

WIDTH = HEIGHT = 800
DEPTH = 8


def analyze(name, lowered_jit, args, n_segments, iters=3, scan_fn=None,
            scan_steps=1):
    """FLOPs/bytes from the per-step compiled program's own cost model;
    wall time from `scan_fn` (a jitted on-device epoch of `scan_steps`
    steps) when given — per-step host dispatch over the remote-attached
    chip costs tens of ms and would swamp the numerator otherwise."""
    import jax
    compiled = lowered_jit.lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per device
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))

    timed = scan_fn or (lambda: jax.block_until_ready(compiled(*args)))
    timed()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        timed()
        best = min(best, time.perf_counter() - t0)
    best /= scan_steps

    achieved_flops = flops / best
    achieved_bw = byts / best
    return {
        "program": name,
        "ms": round(best * 1e3, 2),
        "flops_per_segment": round(flops / n_segments, 1),
        "bytes_per_segment": round(byts / n_segments, 1),
        "arithmetic_intensity_flop_per_byte": round(flops / max(byts, 1), 2),
        "achieved_gflops": round(achieved_flops / 1e9, 1),
        "achieved_gbps": round(achieved_bw / 1e9, 1),
        "pct_of_vpu_peak": round(100 * achieved_flops / VPU_PEAK, 1),
        "pct_of_hbm_peak": round(100 * achieved_bw / HBM_PEAK, 1),
        "binding_roof": ("VPU" if achieved_flops / VPU_PEAK
                         > achieved_bw / HBM_PEAK else "HBM"),
        "segments_per_s": round(n_segments / best),
    }


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.render import integrator as I
    from project3_cuda_path_tracer_tpu.models.inverse import (
        RenderParams, make_train_step)

    print("backend:", jax.default_backend(), flush=True)
    scene = load_scene(os.path.join(ROOT, "scenes/cornell.txt"))
    gt = tuple(int(t) for t in np.asarray(scene.geoms.type))
    cfg = I.TraceConfig(width=WIDTH, height=HEIGHT, trace_depth=DEPTH,
                        antialias=True, geom_types=gt, glossy=False,
                        sky=False)
    n_seg = WIDTH * HEIGHT * DEPTH

    accum = jnp.zeros((HEIGHT, WIDTH, 3), jnp.float32)
    key = jax.random.PRNGKey(0)
    s = scene

    fwd = jax.jit(lambda a, m, c, k: I.render_step(
        a, m, c, s.geoms, s.meshes, s.textures, k, cfg))

    SCAN = 20

    @jax.jit
    def fwd_epoch(a, m, c, k):
        def one(acc, i):
            return I.render_step(acc, m, c, s.geoms, s.meshes, s.textures,
                                 jax.random.fold_in(k, i), cfg), None
        a, _ = jax.lax.scan(one, a, jnp.arange(SCAN))
        return a

    fwd_args = [accum, s.materials, s.camera.flat(), key]

    def fwd_scan():
        jax.block_until_ready(fwd_epoch(*fwd_args))

    print(json.dumps(analyze(
        "forward_step", fwd, (accum, s.materials, s.camera.flat(), key),
        n_seg, scan_fn=fwd_scan, scan_steps=SCAN)), flush=True)

    from project3_cuda_path_tracer_tpu.models.inverse import make_train_scan
    opt, step = make_train_step(s.geoms, s.meshes, s.textures, cfg)
    params = jax.tree_util.tree_map(
        jnp.array, RenderParams(materials=s.materials, cam=s.camera.flat()))
    opt_state = opt.init(params)
    target = jnp.zeros((HEIGHT, WIDTH, 3), jnp.float32)

    # make_train_step's jit donates params/opt_state; wrap so analyze can
    # call it repeatedly with the same buffers.
    def run_step(p, o, k, t):
        return step(jax.tree_util.tree_map(jnp.array, p),
                    jax.tree_util.tree_map(jnp.array, o), k, t)

    _, run_epoch = make_train_scan(s.geoms, s.meshes, s.textures, cfg,
                                   num_steps=SCAN)
    state = {"p": params, "o": opt_state}

    def train_scan():
        p, o, losses = run_epoch(
            jax.tree_util.tree_map(jnp.array, state["p"]),
            jax.tree_util.tree_map(jnp.array, state["o"]), key, target)
        jax.block_until_ready(losses)

    # fwd+bwd counts twice the segments of a render (the unbiased loss
    # renders one detached primal + one differentiated image).
    print(json.dumps(analyze(
        "fwdbwd_train_step", jax.jit(run_step),
        (params, opt_state, key, target), 2 * n_seg,
        scan_fn=train_scan, scan_steps=SCAN)), flush=True)


if __name__ == "__main__":
    main()
