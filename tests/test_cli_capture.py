"""End-to-end CLI test mode: synthetic subject -> run_avatarcap -> outputs.

Covers the reference's `-m test` surface (reference main.py:275-504):
dataset loading in test mode, checkpoint-less template init, the full
capture (avatar + fusion + ReconNet) per frame, and the saved renders +
PLY outputs.
"""

import dataclasses
import os

import numpy as np
import pytest

from conftest import make_toy_smpl_params


def _run_cli(tmp_path, monkeypatch, stream):
    import jax
    import jax.numpy as jnp
    from avatarcap_tpu.tools.gen_synthetic import generate_subject
    from avatarcap_tpu.body.smpl import canonical_pose, SmplParams
    from avatarcap_tpu.models.recon import ReconNetwork
    from avatarcap_tpu.train import checkpoints as ckpt
    from avatarcap_tpu.config import Config
    from avatarcap_tpu import cli

    params = make_toy_smpl_params()
    subject = str(tmp_path / "subject")
    poses = np.stack([canonical_pose()])
    generate_subject(subject, params, np.zeros(10, np.float32), poses,
                     n_views=1, img_size=64, pos_map_res=64,
                     sur_pts_count=2000, vol_pts_count=200)

    # a (random-weight) recon checkpoint so the w_recon path runs
    recon = ReconNetwork()
    recon_vars = jax.jit(recon.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 6)),
        jnp.zeros((1, 8, 3)), jnp.zeros((1, 3)))
    recon_dir = tmp_path / "recon_ckpt"
    os.makedirs(recon_dir)
    ckpt.save_pytree(str(recon_dir / "recon_net.msgpack"), recon_vars)

    # licensed SMPL pkls are absent: the CLI's loader returns the toy body
    monkeypatch.setattr(SmplParams, "load",
                        staticmethod(lambda path: params))

    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        training=dataclasses.replace(cfg.training,
                                     training_data_dir=subject),
        testing=dataclasses.replace(
            cfg.testing, vol_res=(32, 32, 16), testing_data_dir=subject,
            output_dir=str(tmp_path / "out"),
            recon_net_ckpt=str(recon_dir),
            max_tris=1 << 14, max_active=1 << 13, render_res=64))

    cli.run_avatarcap(cfg, w_recon=True, w_nerf=False,
                      save_avatar_mesh=True, save_final_mesh=True,
                      stream=stream)

    out = tmp_path / "out"
    assert (out / "cano_avatar" / "0000.jpg").exists()
    assert (out / "live_avatar" / "0000.jpg").exists()
    assert (out / "live_recon" / "0000.jpg").exists()
    assert (out / "0000_avatar.ply").exists()
    assert (out / "0000_recon.ply").exists()
    # the PLYs contain real geometry
    from avatarcap_tpu.data.mesh_io import load_ply
    v, f, _, _ = load_ply(str(out / "0000_avatar.ply"))
    assert v.shape[0] > 100 and np.isfinite(v).all()
    return v


@pytest.mark.slow
def test_cli_test_mode(tmp_path, monkeypatch):
    _run_cli(tmp_path, monkeypatch, stream=0)


@pytest.mark.slow
def test_cli_test_mode_streaming(tmp_path, monkeypatch):
    """--stream N routes through pipeline/streaming.py (frames vmapped +
    sharded over the 8-virtual-device mesh) and must produce the same
    per-frame output files and geometry as the frame-at-a-time loop."""
    v_stream = _run_cli(tmp_path / "s", monkeypatch, stream=1)
    v_loop = _run_cli(tmp_path / "l", monkeypatch, stream=0)
    assert v_stream.shape == v_loop.shape
    np.testing.assert_allclose(v_stream, v_loop, atol=1e-4)
