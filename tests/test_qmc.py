"""Owen-scrambled Sobol sampler (ops/qmc.py): bit plumbing, the (0,2)
prefix-stratification property through scrambling + index shuffling,
uniformity, and determinism."""
import numpy as np
import jax.numpy as jnp

from project3_cuda_path_tracer_tpu.ops import qmc


def test_reverse_bits():
    x = jnp.asarray([0x1, 0x80000000, 0xDEADBEEF], dtype=jnp.uint32)
    r = np.asarray(qmc.reverse_bits32(x))
    assert r[0] == 0x80000000 and r[1] == 0x1
    assert qmc.reverse_bits32(jnp.asarray(r)).tolist() == \
        np.asarray(x).tolist()


def test_sobol2d_prefixes_stratified():
    """Plain Sobol (0,2): the first 4^k points put exactly one point in
    every aligned cell of every 2^a x 2^b grid with a+b = 2k."""
    idx = jnp.arange(64, dtype=jnp.uint32)
    bx, by = qmc.sobol2d_bits(idx)
    x = np.asarray(bx) * 2.0 ** -32
    y = np.asarray(by) * 2.0 ** -32
    for n, (gx, gy) in ((16, (4, 4)), (64, (8, 8)), (64, (2, 32)),
                        (64, (32, 2))):
        cells = set((int(a * gx), int(b * gy))
                    for a, b in zip(x[:n], y[:n]))
        assert len(cells) == n, (n, gx, gy)


def test_owen_pair_keeps_stratification():
    """Owen scrambling + Owen index shuffling preserve the net property
    for power-of-2 prefixes (the whole point of ops/qmc.py)."""
    for seeds in ((123456, 777, 999), (1, 2, 3), (0xABCDEF, 42, 7)):
        idx = jnp.arange(64, dtype=jnp.uint32)
        full = lambda v: jnp.full((64,), v, jnp.uint32)
        ux, uy = qmc.owen_sobol_pair(idx, full(seeds[0]), full(seeds[1]),
                                     full(seeds[2]))
        ux, uy = np.asarray(ux), np.asarray(uy)
        for n, g in ((16, 4), (64, 8)):
            cells = set((int(a * g), int(b * g))
                        for a, b in zip(ux[:n], uy[:n]))
            assert len(cells) == n, (seeds, n)
        # each dim alone is a scrambled radical inverse: 1-D stratified
        assert len(set((ux[:64] * 64).astype(int))) == 64


def test_sample_planes_uniform_and_deterministic():
    pix = jnp.arange(4096, dtype=jnp.int32)
    a = qmc.sample_planes(11, 3, pix, 4, 0x55)
    b = qmc.sample_planes(11, 3, pix, 4, 0x55)
    for ua, ub in zip(a, b):
        np.testing.assert_array_equal(np.asarray(ua), np.asarray(ub))
    for u in a:
        u = np.asarray(u)
        assert 0.48 < u.mean() < 0.52
        assert u.min() >= 0.0 and u.max() < 1.0
    # different depth/salt give different planes
    c = qmc.sample_planes(11, 4, pix, 4, 0x55)
    assert not np.allclose(np.asarray(a[0]), np.asarray(c[0]))
