"""Grid-DDA traversal go/no-go probe (round-4 verdict item 3).

The round-3 post-mortem pinned the blob's 311 ms traversal on the Mosaic
while-loop body's serial-chain latency (shared-cursor packet BVH). The one
structurally different machine never tried: a LOCKSTEP, stack-free uniform
grid — every lane DDA-steps its own cell (pure vector math, no scalar
cursor), Moller-Trumbore on the cell's triangle list. Its feasibility
hinges on ONE primitive this probe measures directly: per-lane divergent
fetches (cell metadata + triangle rows) at wavefront scale, which on this
toolchain means XLA flat 1-D takes (Mosaic tpu.dynamic_gather fails to
lower for big tables — tools/exp_gather.py, round 2).

Three measurements, one verdict:
  grid  — host-side: build an R^3 uniform grid over the blob
          (scenes/mesh.txt), report cell occupancy + duplication, and
          DDA-walk the REAL dumped depth-0 wavefront (exp_rebin_sim.py
          dump) on the host to get the per-ray cells-stepped /
          tris-tested distributions (the work model).
  xla   — jitted single-level DDA on the device: scan over max-steps,
          per-lane cell-meta take + K-slot triangle takes per step.
          Measured ms for the 1M-ray depth-0 wavefront vs the packet
          kernel's own depth-0 ms (exp_trav_bench.py).
  takes — the bare take-throughput floor: ms for the probe's own number
          of per-lane fetches with no traversal logic at all (a lower
          bound no DDA implementation can beat).

Usage:
  python tools/exp_rebin_sim.py dump       # once, writes /tmp/rebin_rays.npz
  python tools/exp_dda_probe.py [--res 64] [--k 16] [--max-steps 96]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DUMP = "/tmp/rebin_rays.npz"


def build_grid(v0, e1, e2, res):
    """Uniform grid over the tri soup: conservative AABB binning.
    Returns (origin, cell_size, starts [C], counts [C], tri_ids [S])."""
    import numpy as np
    lo = np.minimum(np.minimum(v0, v0 + e1), v0 + e2).min(0) - 1e-4
    hi = np.maximum(np.maximum(v0, v0 + e1), v0 + e2).max(0) + 1e-4
    cell = (hi - lo) / res
    t_lo = np.floor((np.minimum(np.minimum(v0, v0 + e1), v0 + e2) - lo)
                    / cell).astype(np.int64)
    t_hi = np.floor((np.maximum(np.maximum(v0, v0 + e1), v0 + e2) - lo)
                    / cell).astype(np.int64)
    t_lo = np.clip(t_lo, 0, res - 1)
    t_hi = np.clip(t_hi, 0, res - 1)
    spans = (t_hi - t_lo + 1)
    n_pairs = int(spans.prod(1).sum())
    tri_of = np.empty(n_pairs, np.int64)
    cell_of = np.empty(n_pairs, np.int64)
    w = 0
    for t in range(v0.shape[0]):
        (x0, y0, z0), (x1, y1, z1) = t_lo[t], t_hi[t]
        zz, yy, xx = np.meshgrid(np.arange(z0, z1 + 1),
                                 np.arange(y0, y1 + 1),
                                 np.arange(x0, x1 + 1), indexing="ij")
        ids = (zz * res + yy) * res + xx
        k = ids.size
        tri_of[w:w + k] = t
        cell_of[w:w + k] = ids.ravel()
        w += k
    order = np.argsort(cell_of, kind="stable")
    cell_of, tri_of = cell_of[order], tri_of[order]
    counts = np.bincount(cell_of, minlength=res ** 3)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return lo, cell, starts.astype(np.int64), counts.astype(np.int64), \
        tri_of


def host_dda_stats(o, d, tb, grid, res, cap=512):
    """Vectorized host DDA over all rays: cells stepped until the walk
    leaves the grid or exceeds t_bound; tris touched = sum of counts."""
    import numpy as np
    lo, cell, starts, counts, _ = grid
    inv = np.where(np.abs(d) > 1e-12, 1.0 / d, 1e12)
    # clip ray to grid AABB
    t0s = (lo - o) * inv
    t1s = (lo + cell * res - o) * inv
    tmin = np.minimum(t0s, t1s).max(1)
    tmax = np.maximum(t0s, t1s).min(1)
    tmin = np.maximum(tmin, 0.0)
    hit_box = tmax > tmin
    t_enter = np.where(hit_box, tmin + 1e-6, np.inf)
    p = o + t_enter[:, None] * d
    ci = np.clip(((p - lo) / cell).astype(np.int64), 0, res - 1)
    step = np.where(d > 0, 1, -1).astype(np.int64)
    t_next = (lo + (ci + (step > 0)) * cell - o) * inv
    dt = np.abs(cell * inv)
    alive = hit_box.copy()
    t_cur = t_enter.copy()
    cells_stepped = np.zeros(o.shape[0], np.int64)
    tris_touched = np.zeros(o.shape[0], np.int64)
    for _ in range(cap):
        if not alive.any():
            break
        flat = (ci[:, 2] * res + ci[:, 1]) * res + ci[:, 0]
        c = np.where(alive, counts[np.clip(flat, 0, res ** 3 - 1)], 0)
        tris_touched += c
        cells_stepped += alive
        ax = np.argmin(t_next, 1)
        t_cur = t_next[np.arange(len(ax)), ax]
        ci[np.arange(len(ax)), ax] += step[np.arange(len(ax)), ax]
        t_next[np.arange(len(ax)), ax] += dt[np.arange(len(ax)), ax]
        oob = (ci[np.arange(len(ax)), ax] < 0) | \
            (ci[np.arange(len(ax)), ax] >= res)
        alive &= ~oob & (t_cur < tb)
    return cells_stepped, tris_touched


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--k", type=int, default=16,
                    help="triangle slots tested per cell step in the XLA "
                         "DDA (cells with more tris would need multi-pass)")
    ap.add_argument("--max-steps", type=int, default=96)
    ap.add_argument("--rays", type=int, default=0,
                    help="probe on the first N rays only (0 = all)")
    ap.add_argument("--skip-xla", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from project3_cuda_path_tracer_tpu import load_scene

    print("backend:", jax.default_backend(), flush=True)
    scene = load_scene(os.path.join(ROOT, "scenes/mesh.txt"))
    m = scene.meshes
    v0 = np.asarray(m.tri_v0, np.float32)
    e1 = np.asarray(m.tri_e1, np.float32)
    e2 = np.asarray(m.tri_e2, np.float32)
    res = args.res

    t0 = time.perf_counter()
    grid = build_grid(v0, e1, e2, res)
    lo, cell, starts, counts, tri_ids = grid
    occ = counts > 0
    print(json.dumps({
        "stage": "grid", "res": res, "tris": int(v0.shape[0]),
        "build_s": round(time.perf_counter() - t0, 1),
        "occupied_cells": int(occ.sum()),
        "occupancy_pct": round(100.0 * occ.mean(), 1),
        "pairs": int(tri_ids.shape[0]),
        "dup_factor": round(tri_ids.shape[0] / v0.shape[0], 2),
        "max_cell_tris": int(counts.max()),
        "p99_cell_tris": int(np.percentile(counts[occ], 99)),
        "mean_cell_tris": round(float(counts[occ].mean()), 1),
    }), flush=True)

    if not os.path.exists(DUMP):
        print("no wavefront dump; run `python tools/exp_rebin_sim.py dump` "
              "first (stats below use depth-0 camera rays only)",
              file=sys.stderr)
        return 1
    z = np.load(DUMP)
    o = np.asarray(z["o0"], np.float32)
    d = np.asarray(z["d0"], np.float32)
    tb = np.asarray(z["t0"], np.float32)
    if args.rays:
        o, d, tb = o[:args.rays], d[:args.rays], tb[:args.rays]

    t0 = time.perf_counter()
    cells, tris = host_dda_stats(o, d, tb, grid, res)
    print(json.dumps({
        "stage": "sim", "rays": int(o.shape[0]),
        "sim_s": round(time.perf_counter() - t0, 1),
        "mean_cells_stepped": round(float(cells.mean()), 1),
        "p99_cells_stepped": int(np.percentile(cells, 99)),
        "mean_tris_touched": round(float(tris.mean()), 1),
        "p99_tris_touched": int(np.percentile(tris, 99)),
        "total_cell_fetches": int(cells.sum()),
        "total_tri_fetches": int(tris.sum()),
    }), flush=True)

    if args.skip_xla:
        return 0

    # ---- XLA lockstep DDA: the real candidate kernel, measured ---------
    # Dense K-slot cell lists: [C, K] int32 (tris beyond K dropped — the
    # probe only measures COST; a shippable kernel would multi-pass).
    C = res ** 3
    K = args.k
    lists = np.zeros((C, K), np.int32)
    for cidx in np.nonzero(occ)[0]:
        s, c = starts[cidx], min(counts[cidx], K)
        lists[cidx, :c] = tri_ids[s:s + c]
    covered = float(np.minimum(counts, K).sum() / max(counts.sum(), 1))
    lists_flat = jnp.asarray(lists.reshape(-1))
    counts_j = jnp.asarray(np.minimum(counts, K).astype(np.int32))
    v0x, v0y, v0z = (jnp.asarray(v0[:, i]) for i in range(3))
    e1x, e1y, e1z = (jnp.asarray(e1[:, i]) for i in range(3))
    e2x, e2y, e2z = (jnp.asarray(e2[:, i]) for i in range(3))
    lo_j = jnp.asarray(lo)
    cell_j = jnp.asarray(cell)

    N = o.shape[0]
    oj = jnp.asarray(o)
    dj = jnp.asarray(d)
    tbj = jnp.asarray(tb)

    @jax.jit
    def dda(o, d, tb):
        inv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 1e12)
        t0s = (lo_j - o) * inv
        t1s = (lo_j + cell_j * res - o) * inv
        tmin = jnp.maximum(jnp.minimum(t0s, t1s).max(1), 0.0)
        tmax = jnp.maximum(t0s, t1s).min(1)
        alive0 = tmax > tmin
        t_enter = tmin + 1e-6
        p = o + t_enter[:, None] * d
        ci = jnp.clip(((p - lo_j) / cell_j).astype(jnp.int32), 0, res - 1)
        stepv = jnp.where(d > 0, 1, -1).astype(jnp.int32)
        t_next = (lo_j + (ci + (stepv > 0)) * cell_j - o) * inv
        dt = jnp.abs(cell_j * inv)
        best = jnp.minimum(tb, 1e30)

        def body(carry, _):
            ci, t_next, alive, best = carry
            flat = (ci[:, 2] * res + ci[:, 1]) * res + ci[:, 0]
            flat = jnp.clip(flat, 0, C - 1)
            cnt = jnp.where(alive, jnp.take(counts_j, flat), 0)
            # K-slot Moller-Trumbore, per-lane tri gathers (9 takes/slot)
            for k in range(K):
                tri = jnp.take(lists_flat, flat * K + k)
                valid = alive & (k < cnt)
                tv0 = (jnp.take(v0x, tri), jnp.take(v0y, tri),
                       jnp.take(v0z, tri))
                te1 = (jnp.take(e1x, tri), jnp.take(e1y, tri),
                       jnp.take(e1z, tri))
                te2 = (jnp.take(e2x, tri), jnp.take(e2y, tri),
                       jnp.take(e2z, tri))
                px = d[:, 1] * te2[2] - d[:, 2] * te2[1]
                py = d[:, 2] * te2[0] - d[:, 0] * te2[2]
                pz = d[:, 0] * te2[1] - d[:, 1] * te2[0]
                det = te1[0] * px + te1[1] * py + te1[2] * pz
                idet = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                tx = o[:, 0] - tv0[0]
                ty = o[:, 1] - tv0[1]
                tz = o[:, 2] - tv0[2]
                u = (tx * px + ty * py + tz * pz) * idet
                qx = ty * te1[2] - tz * te1[1]
                qy = tz * te1[0] - tx * te1[2]
                qz = tx * te1[1] - ty * te1[0]
                v = (d[:, 0] * qx + d[:, 1] * qy + d[:, 2] * qz) * idet
                t = (te2[0] * qx + te2[1] * qy + te2[2] * qz) * idet
                ok = valid & (u >= 0) & (v >= 0) & (u + v <= 1) & \
                    (t > 1e-4) & (t < best)
                best = jnp.where(ok, t, best)
            ax = jnp.argmin(t_next, 1)
            t_exit = jnp.take_along_axis(t_next, ax[:, None], 1)[:, 0]
            hit_here = best <= t_exit          # first-hit termination
            ci = ci.at[jnp.arange(N), ax].add(
                jnp.where(alive, jnp.take_along_axis(
                    stepv, ax[:, None], 1)[:, 0], 0))
            t_next = t_next.at[jnp.arange(N), ax].add(
                jnp.take_along_axis(dt, ax[:, None], 1)[:, 0])
            cnew = jnp.take_along_axis(ci, ax[:, None], 1)[:, 0]
            oob = (cnew < 0) | (cnew >= res)
            alive = alive & ~oob & ~hit_here & (t_exit < best)
            return (ci, t_next, alive, best), None

        (ci, t_next, alive, best), _ = jax.lax.scan(
            body, (ci, t_next, alive0, best), None, length=args.max_steps)
        return best

    t = dda(oj, dj, tbj)
    np.asarray(t)
    reps = 4
    t0 = time.perf_counter()
    for _ in range(reps):
        t = dda(oj, dj, tbj)
    np.asarray(t)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(json.dumps({
        "stage": "xla_dda", "rays": int(N), "K": K,
        "max_steps": args.max_steps,
        "tri_coverage_at_K": round(covered, 3),
        "depth0_ms": round(ms, 1),
        "note": "compare to exp_trav_bench depth-0 packet ms; the DDA "
                "also still owes a second pass for cells beyond K and "
                "the non-mesh scene merge",
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
