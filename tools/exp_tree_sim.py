"""Round-3 pop-count sizing: tree + ordering variants on REAL wavefronts.

Round-2 established the bvh8 kernel's cost is ~proportional to POPS (ALU
shaves measure neutral: the defer_attrs A/B removed ~30% of leaf vector
ops and saved nothing in-kernel — tools/exp_defer.py). So the remaining
levers are structural: fewer pops via tree quality, push ordering, and
pop-time re-pruning. This tool sizes each on the wavefronts dumped by
exp_rebin_sim.py (run `python tools/exp_rebin_sim.py dump` first):

  centroid  — HEAD: build-order children, packet-centroid near/far vote
  tmin      — push children sorted by their actual packet-min tmin
              (the exact per-node near-to-far; kernel would need 8 extra
              min-reductions or packed 8-bit keys)
  popprune  — centroid + pop-time discard: a stack entry whose push-time
              packet-min tmin now exceeds the packet-max live t_best is
              skipped (CWBVH-style); only fires once EVERY live lane has
              a finite bound, so sky-heavy packets see no benefit
  tmin+pp   — both

plus leaf-size variants (rebuilt trees) under the winning order.

Usage: python tools/exp_tree_sim.py [--packets 8] [--depths 0,1,2,3]
       [--leaves 4,8]
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


class Sim:
    """Numpy shared-cursor bvh8 sim with ordering/pruning variants."""

    def __init__(self, packed):
        import numpy as np
        self.nf = np.asarray(packed.nodes_f)
        self.ni = np.asarray(packed.nodes_i)
        self.tris = np.asarray(packed.tris)

    def packet_pops(self, o, d, tb, order="centroid", pop_prune=False,
                    max_pops=200000):
        import numpy as np
        nf, ni, tris = self.nf, self.ni, self.tris
        inv = 1.0 / d
        t_best = tb.copy()
        live = tb > 0.0
        n_live = max(int(live.sum()), 1)
        cen = ((o[:, 0] * live).sum() / n_live,
               (o[:, 1] * live).sum() / n_live,
               (o[:, 2] * live).sum() / n_live)
        # stack entries: (encoding, push-time packet-min tmin)
        stack = [(0, 0.0)]
        pops = interior = leaf = skipped = 0
        while stack and pops < max_pops:
            e, e_tmin = stack.pop()
            if pop_prune:
                lt = t_best[live]
                tmax_live = lt.max() if lt.size else 0.0
                if e_tmin > tmax_live:
                    skipped += 1
                    continue
            pops += 1
            if e <= -2:
                leaf += 1
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
                    pushes.append((int(rowi[c]), float(tmin[hit].min())))
            if order == "tmin":
                pushes.sort(key=lambda p: -p[1])   # farthest pushed first
            else:
                axis = int(rowi[16])
                if cen[axis] < float(rowf[64]):
                    pushes.reverse()
            stack.extend(pushes)
        return dict(pops=pops, interior=interior, leaf=leaf,
                    skipped=skipped)


def main():
    import numpy as np
    import functools
    import project3_cuda_path_tracer_tpu.scene.bvh as SB
    import project3_cuda_path_tracer_tpu.ops.bvh8 as B8
    from project3_cuda_path_tracer_tpu import load_scene

    args = sys.argv[1:]
    n_packets = 8
    depths = [0, 1, 2, 3]
    leaves = [4]
    for i, a in enumerate(args):
        if a == "--packets":
            n_packets = int(args[i + 1])
        if a == "--depths":
            depths = [int(x) for x in args[i + 1].split(",")]
        if a == "--leaves":
            leaves = [int(x) for x in args[i + 1].split(",")]

    z = np.load(DUMP)
    rng = np.random.default_rng(0)
    orig_build, orig_k = SB.build_bvh, B8.WIDE_LEAF_K

    for leaf in leaves:
        SB.build_bvh = functools.partial(orig_build, leaf_k=leaf)
        B8.WIDE_LEAF_K = leaf
        try:
            scene = load_scene(os.path.join(ROOT, "scenes/mesh.txt"))
            s = Sim(scene.packed_meshes[0])
        finally:
            SB.build_bvh, B8.WIDE_LEAF_K = orig_build, orig_k
        for dep in depths:
            o, d, tb = z[f"o{dep}"], z[f"d{dep}"], z[f"t{dep}"]
            n_pk = o.shape[0] // PACKET
            pick = rng.choice(n_pk, min(n_packets, n_pk), replace=False)
            for order in ("centroid", "tmin"):
                for pp in (False, True):
                    tot = dict(pops=0, interior=0, leaf=0, skipped=0)
                    t0 = time.time()
                    for p in pick:
                        sl = slice(p * PACKET, (p + 1) * PACKET)
                        r = s.packet_pops(o[sl], d[sl], tb[sl], order, pp)
                        for k in tot:
                            tot[k] += r[k]
                    print(json.dumps({
                        "leaf": leaf, "depth": dep, "order": order,
                        "pop_prune": pp,
                        "mean_pops": round(tot["pops"] / len(pick), 1),
                        "mean_interior": round(
                            tot["interior"] / len(pick), 1),
                        "mean_leaf": round(tot["leaf"] / len(pick), 1),
                        "mean_skipped": round(
                            tot["skipped"] / len(pick), 1),
                        "est_total_pops": int(
                            tot["pops"] / len(pick) * n_pk),
                        "sim_s": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
