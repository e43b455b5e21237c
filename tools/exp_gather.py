"""Texture-fetch primitive experiments (one TPU process).

Question: what is the fastest way to fetch 4M arbitrary texels on a v5e?
  xla_take        — jnp.take on a flat [P] table (round-1: ~40M elem/s)
  pallas_dgather  — jnp.take_along_axis(axis=0) inside a Pallas kernel on a
                    lane-replicated [P,128] table (lowers to
                    tpu.dynamic_gather — per-lane-column row gather)
Atlas sizes 128x128 and 256x256, u32-packed RGBA (one gather + elementwise
unpack replaces three f32 gathers).

Usage: python tools/exp_gather.py
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N = 1 << 22          # 4M fetches (one 2048x2048 bounce)
LANES = 128


def timeit(fn, iters=5):
    import jax
    out = fn()
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    for side in (128, 256):
        P = side * side
        flat_u32 = jnp.asarray(rng.integers(0, 2**32, P, dtype=np.uint64)
                               .astype(np.uint32))
        flat_f32 = jnp.asarray(rng.random(P, dtype=np.float32))
        idx = jnp.asarray(rng.integers(0, P, N).astype(np.int32))

        # --- XLA take, f32, three channels -> model as 3x one take -------
        take3 = jax.jit(lambda: (jnp.take(flat_f32, idx),
                                 jnp.take(flat_f32, idx),
                                 jnp.take(flat_f32, idx)))
        dt, _ = timeit(take3)
        print(json.dumps({"prim": "xla_take_f32x3", "P": P,
                          "ms": round(dt * 1e3, 2),
                          "m_elem_s": round(3 * N / dt / 1e6, 1)}),
              flush=True)

        # --- XLA take, one u32 --------------------------------------------
        take1 = jax.jit(lambda: jnp.take(flat_u32, idx))
        dt, _ = timeit(take1)
        print(json.dumps({"prim": "xla_take_u32", "P": P,
                          "ms": round(dt * 1e3, 2),
                          "m_elem_s": round(N / dt / 1e6, 1)}), flush=True)

        # --- Pallas dynamic_gather on a lane-replicated table -------------
        # table [P, 128] (same value per row), indices reshaped to [P, 128]
        # chunks (ray count padded up to a multiple of P*128 is wasteful for
        # P*128 > N, so grid-chunk the indices at rows = P).
        table = jnp.broadcast_to(flat_u32[:, None], (P, LANES))

        rows_per_call = P
        chunk = rows_per_call * LANES
        n_pad = ((N + chunk - 1) // chunk) * chunk
        idx_pad = jnp.concatenate(
            [idx, jnp.zeros((n_pad - N,), jnp.int32)]).reshape(-1, LANES)
        grid = n_pad // chunk

        def kernel(tab_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

        @jax.jit
        def dgather():
            return pl.pallas_call(
                kernel,
                grid=(grid,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec((rows_per_call, LANES),
                                       lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((rows_per_call, LANES),
                                       lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n_pad // LANES, LANES),
                                               jnp.uint32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=120 * 1024 * 1024),
            )(table, idx_pad)

        try:
            dt, out = timeit(dgather)
            got = np.asarray(out).reshape(-1)[:N]
            want = np.asarray(flat_u32)[np.asarray(idx)]
            ok = bool((got == want).all())
            print(json.dumps({"prim": "pallas_dgather_u32", "P": P,
                              "ms": round(dt * 1e3, 2),
                              "m_elem_s": round(N / dt / 1e6, 1),
                              "correct": ok}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"prim": "pallas_dgather_u32", "P": P,
                              "error": str(e)[-300:]}), flush=True)


if __name__ == "__main__":
    main()
