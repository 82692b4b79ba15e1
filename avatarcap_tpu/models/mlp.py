"""Point MLPs.

Functional equivalents of the reference's Conv1d-as-FC stacks
(reference network/mlp.py:5-112), operating channels-last on (B, N, C)
point batches — the natural TPU layout where N tiles onto MXU rows.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from avatarcap_tpu.models.layers import Dense, BatchNorm, leaky_relu


def _activation(name: str):
    if name == "leaky_relu":
        return lambda x: leaky_relu(x, 0.02)  # reference network/mlp.py:11
    if name == "soft_plus":
        return jax.nn.softplus
    return jax.nn.relu


class MLP(nn.Module):
    """Residual-concat MLP (reference network/mlp.py:5-72).

    Layer i with i in res_layers consumes concat([x, input]); the final
    projection has no activation; ``last_op`` optionally applies
    sigmoid/tanh. ``weight_norm`` applies to hidden layers only (the
    reference never weight-norms the output conv, network/mlp.py:46).
    """

    out_channels: int
    inter_channels: Sequence[int]
    res_layers: Sequence[int] = ()
    nlactv: str = "relu"
    last_op: Optional[str] = None
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = _activation(self.nlactv)
        x0 = x
        n = len(self.inter_channels)
        for i, ch in enumerate(self.inter_channels):
            if i in self.res_layers:
                x = jnp.concatenate([x, x0], axis=-1)
            x = Dense(ch, use_weight_norm=self.weight_norm, name=f"fc{i}")(x)
            x = act(x)
        if n in self.res_layers:
            x = jnp.concatenate([x, x0], axis=-1)
        x = Dense(self.out_channels, name=f"fc{n}")(x)
        if self.last_op == "sigmoid":
            x = jax.nn.sigmoid(x)
        elif self.last_op == "tanh":
            x = jnp.tanh(x)
        return x


class OffsetDecoder(nn.Module):
    """POP-style ShapeDecoder (reference network/mlp.py:75-112).

    7 pointwise convs + affine BatchNorm + softplus, skip-concat of the
    input at layer 5. Returns the 256-d feature (the 3-d offset head lives
    in WarpingField, as in the reference).
    """

    hsize: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        act = jax.nn.softplus
        h = x
        for i in range(1, 5):
            h = Dense(self.hsize, name=f"conv{i}")(h)
            h = BatchNorm(affine=True, name=f"bn{i}")(
                h, use_running_average=not train)
            h = act(h)
        h = jnp.concatenate([x, h], axis=-1)
        for i in range(5, 8):
            h = Dense(self.hsize, name=f"conv{i}")(h)
            h = BatchNorm(affine=True, name=f"bn{i}")(
                h, use_running_average=not train)
            h = act(h)
        return h
