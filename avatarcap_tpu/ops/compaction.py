"""Static-shape stream compaction on TPU.

Turning a boolean mask over N elements into the (padded) list of set
indices is the backbone of marching cubes and the rasterizer. The obvious
routes are slow on TPU at N ~ 18.6M:

- scatter-by-rank plateaus at ~160M updates/s (~110 ms);
- jnp.searchsorted over the length-N cumsum runs a 25-iteration while loop
  of random gathers (~160 ms).

This module compacts hierarchically: pack the mask into uint32 words,
count bits per 64-element block (population_count), binary-search only the
N/64-long block cumsum (small enough to cache), then select the r-th set
bit inside the two gathered words with a 5-step mask/popcount walk. All
static shapes; ~10x faster than either baseline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _rth_set_bit(word: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Index of the r-th (0-based) set bit of each uint32 word.

    5-step binary search: does the low half of the remaining range hold
    more than r set bits?
    """
    pos = jnp.zeros_like(r)
    width = 16
    rr = r
    w = word
    for _ in range(5):
        low_mask = ((jnp.uint32(1) << jnp.uint32(width)) - jnp.uint32(1))
        low = jax.lax.population_count(w & low_mask).astype(r.dtype)
        go_high = rr >= low
        rr = jnp.where(go_high, rr - low, rr)
        w = jnp.where(go_high, w >> jnp.uint32(width), w)
        pos = pos + jnp.where(go_high, width, 0)
        width //= 2
    return pos


@functools.partial(jax.jit, static_argnames=("max_out",))
def compact_mask_indices(mask: jnp.ndarray, max_out: int):
    """Indices of set mask entries, padded to max_out.

    Args:
      mask: (N,) bool.
      max_out: static output capacity; overflowing indices are dropped.
    Returns:
      idx: (max_out,) int32 (ascending; padded entries are 0),
      count: () int32 number of valid entries,
      valid: (max_out,) bool.
    """
    N = mask.shape[0]
    pad = (-N) % 64
    bits = jnp.pad(mask, (0, pad)).reshape(-1, 32).astype(jnp.uint32)
    words = jnp.sum(bits << jnp.arange(32, dtype=jnp.uint32)[None, :],
                    axis=-1, dtype=jnp.uint32)             # (Nw,)
    pc = jax.lax.population_count(words).astype(jnp.int32)
    blk_counts = pc.reshape(-1, 2).sum(-1)                 # (Nb,) 64/block
    blk_cum = jnp.cumsum(blk_counts)
    total = blk_cum[-1]

    j = jnp.arange(max_out, dtype=jnp.int32)
    b = jnp.searchsorted(blk_cum, j, side="right").astype(jnp.int32)
    b = jnp.minimum(b, blk_cum.shape[0] - 1)
    r = j - (blk_cum[b] - blk_counts[b])
    w0 = words[2 * b]
    w1 = words[2 * b + 1]
    c0 = jax.lax.population_count(w0).astype(jnp.int32)
    use1 = r >= c0
    word = jnp.where(use1, w1, w0)
    r2 = jnp.where(use1, r - c0, r)
    bit = _rth_set_bit(word, r2)
    idx = b * 64 + jnp.where(use1, 32, 0) + bit
    valid = j < jnp.minimum(total, max_out)
    return jnp.where(valid, idx, 0).astype(jnp.int32), total, valid
