"""Re-binning opportunity sizing for the BVH8 shared-cursor packets.

The mesh configs are bound by incoherent bounce packets visiting large
node unions (BENCHMARKS.md).  Before building any permutation machinery,
this tool measures — on REAL wavefront rays captured from a blob render —
how much the per-packet pop count would shrink under candidate ray
orderings, including the only orderings we can actually apply cheaply on
TPU (per-lane-column bucket grouping via tpu.dynamic_gather, see
tools/exp_gather.py).

Phases:
  dump  (TPU or any backend): render scenes/mesh.txt for one iteration
        with traverse_packets8 monkeypatched to record its inputs
        (qo, qd, t_bound) per call into /tmp/rebin_rays.npz.
  sim   (host, numpy): faithful shared-cursor traversal sim (ordered
        centroid pops, per-lane t_best pruning, fat leaves) counting pops
        per packet under orderings:
          asis     — wavefront order as the kernel sees it today
          octant   — global stable sort by 3-bit direction octant
          octcell  — global stable sort by (origin Morton cell, octant)
          lanebin  — PER-LANE-COLUMN stable sort by the same key (the
                     cheap apply: rows move within their lane column only)
          compact  — asis but dead lanes (t_bound<=0 or root-AABB miss)
                     sunk to the tail per lane column (1-bit lanebin)
        plus the per-ray ideal (each ray alone: union of one path).

Usage:
  python tools/exp_rebin_sim.py dump
  python tools/exp_rebin_sim.py sim [--packets 12] [--depths 1,3,6]
"""
from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DUMP = "/tmp/rebin_rays.npz"
SUB = 16
LANES = 128
PACKET = SUB * LANES
BIG = 1e30


def dump():
    """Eager re-run of the bounce loop (no outer jit) so the traversal
    inputs are concrete; mirrors trace_wavefront's pipeline for the mesh
    config (unroll path, no sort/compact)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import project3_cuda_path_tracer_tpu.ops.bvh8 as B8
    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.render.integrator import (
        Renderer, trace_wavefront)

    captured = []
    orig = B8.traverse_packets8

    def spy(qo, qd, packed, **kw):
        tb = kw.get("t_bound")
        captured.append((
            np.stack([np.asarray(c) for c in qo], 1),
            np.stack([np.asarray(c) for c in qd], 1),
            None if tb is None else np.asarray(tb)))
        return orig(qo, qd, packed, **kw)

    B8.traverse_packets8 = spy
    try:
        scene = load_scene(os.path.join(ROOT, "scenes/mesh.txt"))
        r = Renderer(scene)
        cfg = r.cfg
        import dataclasses
        cfg = dataclasses.replace(cfg, remat=False)
        key = jax.random.fold_in(r.base_key, 0)
        rad = trace_wavefront(scene.materials, scene.camera.flat(),
                              scene.geoms, scene.meshes, scene.textures,
                              key, cfg, packed_meshes=scene.packed_meshes)
        jax.block_until_ready(rad.x)
    finally:
        B8.traverse_packets8 = orig
    out = {}
    for d, (o, dd, tb) in enumerate(captured):
        out[f"o{d}"] = o
        out[f"d{d}"] = dd
        out[f"t{d}"] = (np.full(o.shape[0], BIG, np.float32)
                        if tb is None else tb)
    np.savez_compressed(DUMP, depths=len(captured), **out)
    print(f"dumped {len(captured)} depth wavefronts to {DUMP}", flush=True)


class Sim:
    """Faithful numpy re-implementation of _traverse8_kernel's pop loop
    (ordered='centroid', streams=1) counting pops; leaf hits update t_best
    so occlusion pruning matches the kernel."""

    def __init__(self, packed):
        import numpy as np
        self.nf = np.asarray(packed.nodes_f)
        self.ni = np.asarray(packed.nodes_i)
        self.tris = np.asarray(packed.tris)

    def packet_pops(self, o, d, tb, max_pops=200000):
        import numpy as np
        nf, ni, tris = self.nf, self.ni, self.tris
        inv = 1.0 / d
        t_best = tb.copy()
        live = tb > 0.0
        n_live = max(int(live.sum()), 1)
        cx, cy, cz = (float((o[:, 0] * live).sum() / n_live),
                      float((o[:, 1] * live).sum() / n_live),
                      float((o[:, 2] * live).sum() / n_live))
        cen = (cx, cy, cz)
        stack = [0]
        pops = interior = 0
        while stack and pops < max_pops:
            pops += 1
            e = stack.pop()
            if e <= -2:
                meta = -e - 2
                s, c = meta // 32, meta % 32
                for k in range(s, s + c):
                    r = tris[k]
                    pv = np.cross(d, r[6:9])
                    det = (r[3:6] * pv).sum(1)
                    ok = np.abs(det) > 1e-12
                    idet = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
                    tv = o - r[0:3]
                    bu = (tv * pv).sum(1) * idet
                    qv = np.cross(tv, r[3:6])
                    bv = (d * qv).sum(1) * idet
                    tk = (r[6:9] * qv).sum(1) * idet
                    hit = (ok & (bu >= 0) & (bv >= 0) & (bu + bv <= 1)
                           & (tk > 1e-6) & (tk < t_best))
                    t_best = np.where(hit, tk, t_best)
                continue
            interior += 1
            rowf, rowi = nf[e], ni[e]
            pushes = []
            for c in range(8):
                lo = rowf[6 * c: 6 * c + 3]
                hi = rowf[6 * c + 3: 6 * c + 6]
                if not np.isfinite(lo[0]):
                    continue
                t1 = (lo - o) * inv
                t2 = (hi - o) * inv
                tmin = np.minimum(t1, t2).max(1)
                tmax = np.maximum(t1, t2).min(1)
                hit = (tmax >= tmin) & (tmax > 0) & (tmin < t_best) \
                    & (t_best > 0)
                if hit.any():
                    pushes.append(int(rowi[c]))
            axis = int(rowi[16])
            if cen[axis] < float(rowf[64]):
                pushes.reverse()      # rev: slot 0 pops first
            stack.extend(pushes)
        return pops, interior


def keys_for(o, d, root_lo, root_hi, tb, cell_bits=2):
    """(bucket key, active) — octant 3 bits, origin cell cell_bits per
    axis; inactive (dead or root-miss) get the max key."""
    import numpy as np
    inv = 1.0 / d
    t1 = (root_lo - o) * inv
    t2 = (root_hi - o) * inv
    tmin = np.minimum(t1, t2).max(1)
    tmax = np.maximum(t1, t2).min(1)
    active = (tmax >= tmin) & (tmax > 0) & (tb > 0) & (tmin < tb)
    octant = ((d[:, 0] > 0).astype(np.int64)
              + 2 * (d[:, 1] > 0) + 4 * (d[:, 2] > 0))
    span = np.maximum(root_hi - root_lo, 1e-6)
    cells = 1 << cell_bits
    q = np.clip(((o - root_lo) / span * cells).astype(np.int64), 0,
                cells - 1)
    cell = (q[:, 0] << (2 * cell_bits)) | (q[:, 1] << cell_bits) | q[:, 2]
    key = (cell << 3) | octant
    key = np.where(active, key, key.max() + 1)
    return key, active


def order_variants(o, d, tb, root_lo, root_hi):
    import numpy as np
    n = o.shape[0]
    key, active = keys_for(o, d, root_lo, root_hi, tb)
    out = {"asis": np.arange(n)}
    out["octant"] = np.argsort(np.where(active, key & 7, 8), kind="stable")
    out["octcell"] = np.argsort(key, kind="stable")
    # per-lane-column: element i is at (row i//128, lane i%128); sort rows
    # within each lane column by key
    k2 = key.reshape(-1, LANES)
    perm2 = np.argsort(k2, axis=0, kind="stable")
    out["lanebin"] = (perm2 * LANES
                      + np.arange(LANES)[None, :]).reshape(-1)
    a2 = (~active).astype(np.int64).reshape(-1, LANES)
    pc = np.argsort(a2, axis=0, kind="stable")
    out["compact"] = (pc * LANES + np.arange(LANES)[None, :]).reshape(-1)
    return out, active


def sim():
    import numpy as np
    from project3_cuda_path_tracer_tpu import load_scene

    args = sys.argv[2:]
    n_packets = 12
    depths = None
    for i, a in enumerate(args):
        if a == "--packets":
            n_packets = int(args[i + 1])
        if a == "--depths":
            depths = [int(x) for x in args[i + 1].split(",")]

    scene = load_scene(os.path.join(ROOT, "scenes/mesh.txt"))
    packed = scene.packed_meshes[0]
    s = Sim(packed)
    nf = s.nf[0]
    # root box = union of the 8 root children
    los = np.stack([nf[6 * c: 6 * c + 3] for c in range(8)])
    his = np.stack([nf[6 * c + 3: 6 * c + 6] for c in range(8)])
    ok = np.isfinite(los[:, 0])
    root_lo, root_hi = los[ok].min(0), his[ok].max(0)

    z = np.load(DUMP)
    nd = int(z["depths"])
    if depths is None:
        depths = list(range(nd))
    rng = np.random.default_rng(0)
    for dep in depths:
        o, d, tb = z[f"o{dep}"], z[f"d{dep}"], z[f"t{dep}"]
        n = o.shape[0]
        variants, active = order_variants(o, d, tb, root_lo, root_hi)
        n_pk = n // PACKET
        # per-ray ideal on a subsample of active rays
        idx = np.nonzero(active)[0]
        samp = rng.choice(idx, min(256, len(idx)), replace=False)
        tot = 0
        for i in samp:
            p, _ = s.packet_pops(o[i:i+1], d[i:i+1], tb[i:i+1])
            tot += p
        per_ray = tot / max(len(samp), 1)
        print(json.dumps({
            "depth": dep, "active_frac": round(float(active.mean()), 3),
            "alive_frac": round(float((tb > 0).mean()), 3),
            "per_ray_pops": round(per_ray, 1)}), flush=True)
        pick = rng.choice(n_pk, min(n_packets, n_pk), replace=False)
        for name, perm in variants.items():
            po, pd2, ptb = o[perm], d[perm], tb[perm]
            tpop = tint = 0
            t0 = time.time()
            # active-weighted packet sample: packets chosen uniformly,
            # but report BOTH mean pops over sampled packets and the
            # all-packet estimate scaled by sampled coverage
            for p in pick:
                sl = slice(p * PACKET, (p + 1) * PACKET)
                pops, inter = s.packet_pops(po[sl], pd2[sl], ptb[sl])
                tpop += pops
                tint += inter
            print(json.dumps({
                "depth": dep, "order": name,
                "mean_pops": round(tpop / len(pick), 1),
                "mean_interior": round(tint / len(pick), 1),
                "est_total_pops": int(tpop / len(pick) * n_pk),
                "sim_s": round(time.time() - t0, 1)}), flush=True)


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in ("dump", "sim"):
        print(__doc__)
        return 1
    if sys.argv[1] == "dump":
        dump()
    else:
        sim()
    return 0


if __name__ == "__main__":
    sys.exit(main())
