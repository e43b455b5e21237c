"""Isolate the cost of SCALAR EXTRACTS from VMEM vector rows inside a
Mosaic while loop — the suspected dominator of the BVH8 per-pop time
(~700 cycles/pop nearly independent of packet width; each interior pop
extracts 48 box scalars from the node row, each leaf pop up to 360
triangle scalars).

Three kernels run the same dependent loop of STEPS dynamic row loads
(row index fed by a loop-carried scalar so nothing can be hoisted):
  extract48 — load row [72], extract 48 scalars, fold each into the
              vector state via broadcast multiply-add (the current
              kernel's access pattern);
  extract6  — same but only 6 extracts (is cost ∝ extract count?);
  vector8   — load the row reshaped [8, 9] as a VECTOR, fold it into an
              [8, 128] state with broadcast ops only (zero extracts —
              the candidate child-on-sublane layout).
Each folds the data into the carried state and derives the next row
index from a lane-reduction of the state, so the loop chain matches the
real kernel's pop -> load -> reduce -> next-pop dependency.

Usage: python tools/exp_extract_cost.py
"""
from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

ROWS = 4096          # node-table rows
STEPS = 4096         # dependent loop steps
SUB = 16
LANES = 128


def timeit(fn, iters=3):
    import jax
    jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((ROWS, 72), np.float32) + 0.5)
    state0 = jnp.asarray(rng.random((SUB, LANES), np.float32))

    def make(kind):
        def kernel(tab_ref, st_ref, out_ref):
            st = st_ref[:]

            def body(carry):
                step, idx, st = carry
                row = tab_ref[idx]
                if kind == "extract48":
                    acc = st
                    for c in range(8):
                        for j in range(6):
                            acc = acc * 0.999 + row[6 * c + j]
                    st = acc
                elif kind == "extract6":
                    acc = st
                    for j in range(6):
                        acc = acc * 0.999 + row[j]
                    st = acc
                else:  # vector8
                    v = row[:72].reshape(8, 9)
                    a = st[:8] * 0.999 + v[:, 0:1]
                    for j in range(1, 6):
                        a = a * 0.999 + v[:, j:j + 1]
                    st = st.at[:8].set(a)
                # lane-reduction feeds the next index (dependency chain
                # like the real kernel's push decision)
                nxt = (jnp.sum(st[0:1]).astype(jnp.int32) + step) % ROWS
                return step + 1, jnp.maximum(nxt, 0), st

            def cond(carry):
                return carry[0] < STEPS

            _, _, st = jax.lax.while_loop(cond, body,
                                          (jnp.int32(0), jnp.int32(0), st))
            out_ref[:] = st
        return kernel

    for kind in ("extract6", "extract48", "vector8"):
        run = lambda: pl.pallas_call(
            make(kind),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((SUB, LANES), jnp.float32),
        )(table, state0)
        try:
            dt = timeit(run)
            print(json.dumps({"kind": kind,
                              "ns_per_step": round(dt / STEPS * 1e9, 1)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"kind": kind, "error": str(e)[-300:]}),
                  flush=True)


if __name__ == "__main__":
    main()
