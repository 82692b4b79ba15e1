"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require TPU hardware; sharding logic is exercised on a fake
8-device host platform per SURVEY §4.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Golden-parity tests compare against f64/f32 torch oracles; run all test
# matmuls at full f32 (production TPU keeps the default bf16 MXU path).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(31359)


def make_toy_smpl_params(num_vertices=64, num_joints=24, num_shapes=10,
                         seed=0):
    """A structurally-valid fake SMPL model for tests (no licensed data).

    Kintree is a simple chain with some branching; weights are random
    sparse-ish and normalized.
    """
    from avatarcap_tpu.body.smpl import SmplParams

    rs = np.random.RandomState(seed)
    v_template = rs.uniform(-0.5, 0.5, (num_vertices, 3)).astype(np.float32)
    # some fake faces (not geometrically meaningful)
    faces = rs.randint(0, num_vertices, (2 * num_vertices, 3)).astype(np.int32)
    parents = np.zeros(num_joints, np.int32)
    for j in range(1, num_joints):
        parents[j] = rs.randint(0, j)
    w = rs.uniform(0, 1, (num_vertices, num_joints)).astype(np.float32) ** 4
    w /= w.sum(-1, keepdims=True)
    j_reg = rs.uniform(0, 1, (num_joints, num_vertices)).astype(np.float32)
    j_reg /= j_reg.sum(-1, keepdims=True)
    joints = j_reg @ v_template
    shapedirs = 0.01 * rs.standard_normal(
        (num_vertices * 3, num_shapes)).astype(np.float32)
    return SmplParams(
        v_template=v_template, faces=faces, joints_template=joints,
        kintree_parents=parents, weights=w, j_regressor=j_reg,
        shapedirs=shapedirs)


@pytest.fixture
def toy_smpl():
    return make_toy_smpl_params()
