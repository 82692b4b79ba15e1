"""Stream compaction vs numpy oracle."""

import numpy as np
import jax.numpy as jnp

from avatarcap_tpu.ops.compaction import compact_mask_indices


def test_compaction_matches_numpy(rng):
    for n, p in ((1000, 0.3), (65536, 0.01), (123457, 0.5)):
        mask = rng.uniform(size=n) < p
        ref = np.where(mask)[0]
        cap = int(len(ref) + 37)
        idx, total, valid = compact_mask_indices(jnp.asarray(mask), cap)
        assert int(total) == len(ref)
        np.testing.assert_array_equal(np.asarray(idx)[: len(ref)], ref)
        np.testing.assert_array_equal(np.asarray(valid),
                                      np.arange(cap) < len(ref))


def test_compaction_overflow(rng):
    mask = np.ones(1000, bool)
    idx, total, valid = compact_mask_indices(jnp.asarray(mask), 100)
    assert int(total) == 1000
    np.testing.assert_array_equal(np.asarray(idx), np.arange(100))
    assert bool(np.asarray(valid).all())


def test_compaction_empty():
    mask = np.zeros(512, bool)
    idx, total, valid = compact_mask_indices(jnp.asarray(mask), 64)
    assert int(total) == 0
    assert not np.asarray(valid).any()


def test_adversarial_shapes_and_densities():
    """Overflow, sparse, non-word-multiple, empty, and large-random cases
    against the numpy oracle (exercises the scatter + forward-fill path's
    sentinel-row collisions and word-boundary handling)."""
    from avatarcap_tpu.ops.compaction import compact_mask_indices

    rng = np.random.RandomState(1)
    for n, density, max_out in [
            (1024, 0.99, 128),      # heavy overflow
            (4096, 0.001, 64),      # sparse
            (33, 1.0, 64),          # non-multiple-of-32, all set
            (64, 0.0, 16),          # empty
            (100000, 0.37, 65536)]:  # big random
        mask = rng.rand(n) < density
        idx, cnt, valid = compact_mask_indices(jnp.asarray(mask), max_out)
        ref = np.where(mask)[0]
        got = np.asarray(idx)[np.asarray(valid)]
        assert int(cnt) == len(ref)
        np.testing.assert_array_equal(got, ref[:max_out])
