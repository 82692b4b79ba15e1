"""Fused ReconNet decoder parity (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental.pallas import tpu as pltpu

from avatarcap_tpu.models.recon import ReconNetwork
from avatarcap_tpu.ops.pallas_query import (pack_recon_weights,
                                            recon_decode_fused)
from avatarcap_tpu.models.mlp import MLP


def test_recon_decode_matches_flax(rng):
    recon = ReconNetwork()
    variables = jax.jit(recon.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6)),
        jnp.zeros((1, 8, 3)), jnp.zeros((1, 3)))
    dec = MLP(out_channels=1, inter_channels=(512, 256, 128),
              res_layers=(1, 2), nlactv="leaky_relu", last_op="sigmoid",
              weight_norm=True)
    feats = jnp.asarray(rng.standard_normal((1, 300, 33)).astype(np.float32))
    ref = dec.apply({"params": variables["params"]["image_decoder"]},
                    feats)[0, :, 0]
    packed = pack_recon_weights(variables["params"]["image_decoder"])
    with pltpu.force_tpu_interpret_mode():
        got = recon_decode_fused(packed, feats[0])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2)
    # sigmoid bounded
    g = np.asarray(got)
    assert np.all(g >= 0) and np.all(g <= 1)
