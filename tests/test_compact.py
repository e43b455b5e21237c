"""Stream-compaction / material-sort primitive tests (reference slots:
src/pathtrace.cu:313-317, 366-367)."""
import numpy as np
import jax.numpy as jnp

from project3_cuda_path_tracer_tpu.ops import compact


def test_exclusive_scan():
    x = jnp.array([3, 1, 7, 0, 4])
    np.testing.assert_array_equal(np.asarray(compact.exclusive_scan(x)),
                                  [0, 3, 4, 11, 11])


def test_compaction_permutation_partitions_stably():
    alive = jnp.array([True, False, True, True, False, True])
    perm, num_live = compact.compaction_permutation(alive)
    assert int(num_live) == 4
    np.testing.assert_array_equal(np.asarray(perm), [0, 2, 3, 5, 1, 4])
    assert np.asarray(alive)[np.asarray(perm)][:4].all()


def test_compaction_all_dead_and_all_alive():
    for pattern in ([False] * 4, [True] * 4):
        alive = jnp.array(pattern)
        perm, num_live = compact.compaction_permutation(alive)
        assert int(num_live) == sum(pattern)
        np.testing.assert_array_equal(np.sort(np.asarray(perm)),
                                      np.arange(4))


def test_material_sort_key_ordering():
    alive = jnp.array([True, True, True, False])
    hit_t = jnp.array([1.0, -1.0, 2.0, 3.0])
    mat = jnp.array([2, 0, 1, 0], jnp.int32)
    keys = np.asarray(compact.material_sort_key(alive, hit_t, mat))
    # live hits first (by material), then live miss, then dead
    assert keys[2] < keys[0] < keys[1] < keys[3]


def test_apply_permutation_pytree():
    perm = jnp.array([2, 0, 1], jnp.int32)
    tree = {"a": jnp.arange(3), "b": jnp.arange(6).reshape(3, 2)}
    out = compact.apply_permutation(tree, perm)
    np.testing.assert_array_equal(np.asarray(out["a"]), [2, 0, 1])
    np.testing.assert_array_equal(np.asarray(out["b"])[0], [4, 5])


def test_bucket_sort_matches_argsort():
    import numpy as np
    rng = np.random.default_rng(0)
    n = 1000
    alive = jnp.asarray(rng.random(n) > 0.3)
    hit_t = jnp.asarray(rng.uniform(-1, 5, n).astype(np.float32))
    mat = jnp.asarray(rng.integers(0, 5, n).astype(np.int32))
    ids, buckets = compact.material_bucket_ids(alive, hit_t, mat, 5)
    perm_b = compact.bucket_sort_permutation(ids, buckets)
    perm_a = compact.sort_permutation(ids)
    np.testing.assert_array_equal(np.asarray(perm_b), np.asarray(perm_a))
