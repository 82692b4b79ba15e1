"""NeRF-style positional encoding.

Semantics match the reference embedder (reference utils/net_util.py:11-55):
include_input=True, log-spaced frequencies 2^0..2^(m-1), and the channel
ordering [x, sin(x*f0), cos(x*f0), sin(x*f1), cos(x*f1), ...] where each
sin/cos block keeps the full input dimensionality.
"""

from __future__ import annotations

import jax.numpy as jnp


def embed_dim(num_freqs: int, input_dims: int = 3) -> int:
    """Output dimensionality of positional_encoding."""
    return input_dims * (1 + 2 * num_freqs)


def positional_encoding(x: jnp.ndarray, num_freqs: int) -> jnp.ndarray:
    """Encode (..., D) -> (..., D*(1+2*num_freqs)).

    num_freqs == 0 degenerates to identity (reference warping field uses
    pos_encoding 0, configs/example.yaml:29).
    """
    if num_freqs == 0:
        return x
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)  # (F,)
    # (..., F, D): x * f, then interleave sin/cos blocks per frequency.
    xf = x[..., None, :] * freqs[:, None]
    sin = jnp.sin(xf)
    cos = jnp.cos(xf)
    enc = jnp.stack([sin, cos], axis=-2)  # (..., F, 2, D)
    enc = enc.reshape(*x.shape[:-1], 2 * num_freqs * x.shape[-1])
    return jnp.concatenate([x, enc], axis=-1)
