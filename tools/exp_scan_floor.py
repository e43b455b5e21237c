"""Probe the per-scan-step cost floor seen in exp_fwd_breakdown (every
stage epoch — rng-only, raygen-only, shade-only — timed ~1.3 ms/step
regardless of its work, which would cap a depth-8 render at ~10 ms).

Measures, per step, scan bodies of increasing emptiness and the same work
unrolled in one flat program:
  scan_add1       — carry [N] f32, body = carry + 1
  scan_add1_tiny  — carry [8,128] f32, body = carry + 1
  scan_rng        — body = carry + uniform(fold_in(k, i), [4,N]).sum(0)
  unroll_rng      — same 20 rng draws, Python-unrolled, one jit
  scan_rng_nofold — rng keyed from a scanned-in key array (no fold_in)
  scan_10ew       — body = 10 chained elementwise ops on [N]
  unroll_10ew     — same, unrolled

Usage: python tools/exp_scan_floor.py
"""
from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N = 800 * 800
SCAN = 20


def timeit(fn, iters=5):
    import jax
    jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((N,), jnp.float32)
    tiny0 = jnp.zeros((8, 128), jnp.float32)

    def report(name, dt):
        print(json.dumps({"case": name, "ms_per_step":
                          round(dt / SCAN * 1e3, 3)}), flush=True)

    @jax.jit
    def scan_add1(x):
        return jax.lax.scan(lambda c, _: (c + 1.0, None), x,
                            jnp.arange(SCAN))[0]
    report("scan_add1", timeit(lambda: scan_add1(x0)))

    @jax.jit
    def scan_add1_tiny(x):
        return jax.lax.scan(lambda c, _: (c + 1.0, None), x,
                            jnp.arange(SCAN))[0]
    report("scan_add1_tiny", timeit(lambda: scan_add1_tiny(tiny0)))

    @jax.jit
    def scan_rng(x, k):
        def body(c, i):
            u = jax.random.uniform(jax.random.fold_in(k, i), (4, N))
            return c + u.sum(0), None
        return jax.lax.scan(body, x, jnp.arange(SCAN))[0]
    report("scan_rng", timeit(lambda: scan_rng(x0, key)))

    @jax.jit
    def unroll_rng(x, k):
        for i in range(SCAN):
            u = jax.random.uniform(jax.random.fold_in(k, i), (4, N))
            x = x + u.sum(0)
        return x
    report("unroll_rng", timeit(lambda: unroll_rng(x0, key)))

    keys = jax.random.split(key, SCAN)

    @jax.jit
    def scan_rng_nofold(x, ks):
        def body(c, kk):
            u = jax.random.uniform(kk, (4, N))
            return c + u.sum(0), None
        return jax.lax.scan(body, x, ks)[0]
    report("scan_rng_nofold", timeit(lambda: scan_rng_nofold(x0, keys)))

    @jax.jit
    def scan_10ew(x):
        def body(c, _):
            for _ in range(10):
                c = c * 1.000001 + 0.5
            return c, None
        return jax.lax.scan(body, x, jnp.arange(SCAN))[0]
    report("scan_10ew", timeit(lambda: scan_10ew(x0)))

    @jax.jit
    def unroll_10ew(x):
        for _ in range(SCAN):
            for _ in range(10):
                x = x * 1.000001 + 0.5
        return x
    report("unroll_10ew", timeit(lambda: unroll_10ew(x0)))


if __name__ == "__main__":
    main()


def typed_key_probe():
    """Addendum: the full breakdown's rng epochs used TYPED keys
    (jax.random.key) and measured ~1.3 ms/step; the raw-PRNGKey probe
    above measures ~0.005. Isolate the key representation."""
    import jax
    import jax.numpy as jnp

    x0 = jnp.zeros((N,), jnp.float32)

    def report(name, dt):
        print(json.dumps({"case": name, "ms_per_step":
                          round(dt / SCAN * 1e3, 3)}), flush=True)

    for impl in ("threefry2x32", "rbg"):
        kk = jax.random.key(0, impl=impl)

        @jax.jit
        def scan_rng_typed(x, k):
            def body(c, i):
                u = jax.random.uniform(jax.random.fold_in(k, i), (4, N))
                return c + u.sum(0), None
            return jax.lax.scan(body, x, jnp.arange(SCAN))[0]
        report(f"scan_rng_typed_{impl}", timeit(lambda: scan_rng_typed(x0, kk)))
