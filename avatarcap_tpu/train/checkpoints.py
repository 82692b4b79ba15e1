"""Checkpoint save/load.

Layout mirrors the reference (epoch_N/ + epoch_latest/, net + optimizer,
reference main.py:144-154) using flax msgpack serialization. The torch
checkpoint importer lives in avatarcap_tpu.tools.convert_torch_ckpt.
"""

from __future__ import annotations

import os
from typing import Any

import jax
from flax import serialization


def save_pytree(path: str, tree: Any) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(tree)))


def load_pytree(path: str, template: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_train_state(dir_path: str, state) -> None:
    """net.msgpack = {params, batch_stats}; optm.msgpack = optimizer."""
    os.makedirs(dir_path, exist_ok=True)
    save_pytree(os.path.join(dir_path, "net.msgpack"),
                {"params": state.params, "batch_stats": state.batch_stats})
    save_pytree(os.path.join(dir_path, "optm.msgpack"),
                {"opt_state": state.opt_state, "step": state.step})


def load_network(dir_path: str, template_variables):
    """Load {params, batch_stats} from a checkpoint dir (accepts either our
    msgpack or a converted torch import done ahead of time)."""
    return load_pytree(os.path.join(dir_path, "net.msgpack"),
                       {"params": template_variables["params"],
                        "batch_stats": template_variables.get(
                            "batch_stats", {})})


def load_train_state(dir_path: str, state_template):
    net = load_pytree(os.path.join(dir_path, "net.msgpack"),
                      {"params": state_template.params,
                       "batch_stats": state_template.batch_stats})
    opt = load_pytree(os.path.join(dir_path, "optm.msgpack"),
                      {"opt_state": state_template.opt_state,
                       "step": state_template.step})
    return state_template._replace(params=net["params"],
                                   batch_stats=net["batch_stats"],
                                   opt_state=opt["opt_state"],
                                   step=opt["step"])
