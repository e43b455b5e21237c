"""Standalone bvh8 traversal bench on dumped REAL wavefronts.

Decouples the kernel from the renderer: loads /tmp/rebin_rays.npz
(exp_rebin_sim.py dump), runs traverse_packets8 per depth with a scanned
repeat loop (dispatch-tax immune), and reports ms + exact pop counts
(return_steps) -> per-pop cost. The tool for kernel-change iteration.

Usage: python tools/exp_trav_bench.py [--reps 16] [--kw k=v ...]
  --kw accepts sub=8/16/32 streams=1/2 ordered=centroid/dir/off
       fused=0/1 defer_attrs=0/1 leaf_k=4 reduce_mode=sum3/rollor
"""
from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DUMP = "/tmp/rebin_rays.npz"


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    import project3_cuda_path_tracer_tpu.ops.bvh8 as B8
    from project3_cuda_path_tracer_tpu import load_scene

    args = sys.argv[1:]
    reps = 16
    kw = {}
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1]); i += 2; continue
        if args[i] == "--kw":
            i += 1
            while i < len(args) and "=" in args[i]:
                k, v = args[i].split("=", 1)
                if v in ("0", "1") and k != "sub":
                    kw[k] = bool(int(v))
                elif v.isdigit():
                    kw[k] = int(v)
                elif k == "ordered" and v == "off":
                    kw[k] = False
                else:
                    kw[k] = v
                i += 1
            continue
        i += 1
    print("backend:", jax.default_backend(), "kw:", kw, flush=True)

    scene = load_scene(os.path.join(ROOT, "scenes/mesh.txt"))
    packed = scene.packed_meshes[0]
    z = np.load(DUMP)
    nd = int(z["depths"])

    total_ms = total_pops = 0.0
    for dep in range(nd):
        o = jnp.asarray(z[f"o{dep}"])
        d = jnp.asarray(z[f"d{dep}"])
        tb = jnp.asarray(z[f"t{dep}"])
        qo = (o[:, 0], o[:, 1], o[:, 2])
        qd = (d[:, 0], d[:, 1], d[:, 2])

        def run(qo=qo, qd=qd, tb=tb):
            t, _, _, _, tri, steps = B8.traverse_packets8(
                qo, qd, packed, t_bound=tb, return_steps=True, **kw)
            return t, tri, steps

        t, tri, steps = run()
        pops = int(np.asarray(steps, np.int64).sum())
        hits = int(np.asarray(tri >= 0).sum())

        @jax.jit
        def loop(tb):
            def body(c, _):
                # (c - c) == 0.0 but is opaque to the algebraic
                # simplifier (NaN semantics), so the pallas_call depends
                # on the carry and cannot be hoisted out of the scan.
                t, tri, steps = run(tb=tb + (c - c))
                return c + jnp.sum(t), None
            s, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
            return s

        np.asarray(loop(tb))              # compile+warm
        t0 = time.perf_counter()
        np.asarray(loop(tb))
        ms = (time.perf_counter() - t0) / reps * 1e3
        total_ms += ms
        total_pops += pops
        print(json.dumps({
            "depth": dep, "ms": round(ms, 2), "pops": pops,
            "hits": hits,
            "us_per_pop": round(ms * 1e3 / max(pops, 1), 3)}), flush=True)
    print(json.dumps({
        "total_ms": round(total_ms, 1), "total_pops": int(total_pops),
        "us_per_pop": round(total_ms * 1e3 / total_pops, 3)}), flush=True)


if __name__ == "__main__":
    main()
