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
