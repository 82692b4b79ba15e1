"""Command-line entry point (reference main.py:507-529 surface).

Usage:
  python -m avatarcap_tpu.cli -c configs/example.yaml -m train
  python -m avatarcap_tpu.cli -c configs/example.yaml -m test
"""

from __future__ import annotations

import os
from argparse import ArgumentParser

import numpy as np


def _load_subject(cfg, data_dir: str, training: bool):
    import jax.numpy as jnp
    from avatarcap_tpu.body.smpl import SmplParams
    from avatarcap_tpu.data.dataset import AvatarCapDataset
    from avatarcap_tpu.pipeline.avatar import AvatarStatics

    gender_file = {
        "M": "basicmodel_m_lbs_10_207_0_v1.0.0.pkl",
        "F": "basicmodel_f_lbs_10_207_0_v1.0.0.pkl",
        "N": "basicmodel_n_lbs_10_207_0_v1.0.0.pkl",
    }[cfg.smpl_gender]
    smpl_params = SmplParams.load(
        os.path.join(cfg.smpl_model_dir, gender_file))
    ds = AvatarCapDataset(data_dir, training=training,
                          smpl_params=smpl_params,
                          vol_res=cfg.testing.vol_res,
                          training_data_ids=(
                              np.loadtxt(cfg.training.training_data_ids)
                              .astype(np.int32)
                              if cfg.training.training_data_ids else None))
    wv_path = os.path.join(cfg.training.training_data_dir,
                           "cano_base_blend_weight_volume.npy")
    weight_volume = np.load(wv_path)
    statics = AvatarStatics(
        weight_volume=jnp.asarray(weight_volume),
        cano_smpl_vertices=jnp.asarray(ds.cano_smpl_v),
        smpl_skinning_weights=jnp.asarray(smpl_params.weights),
        cano_bounds=jnp.asarray(ds.cano_bounds),
        cano_smpl_center=jnp.asarray(ds.cano_smpl_center))
    return ds, statics, smpl_params


def train_avatar(cfg):
    """reference main.py:28-159."""
    import jax
    import jax.numpy as jnp
    from avatarcap_tpu.models.avatar import GeoTexAvatar
    from avatarcap_tpu.train.trainer import AvatarTrainer
    from avatarcap_tpu.train import checkpoints as ckpt

    ds, statics, _ = _load_subject(cfg, cfg.training.training_data_dir, True)
    module = GeoTexAvatar(
        pos_encoding_template=cfg.model.cano_template_pos_encoding,
        pos_encoding_warp=cfg.model.warping_field_pos_encoding,
        if_type=cfg.if_type)
    item0 = ds[0]
    variables = jax.jit(module.init)(
        jax.random.PRNGKey(31359), jnp.zeros((1, 8, 3)),
        jnp.asarray(item0["smpl_pos_map"])[None],
        statics.cano_smpl_center[None])

    trainer = AvatarTrainer(
        module=module, statics=statics,
        net_ckpt_dir=cfg.training.net_ckpt_dir, if_type=cfg.if_type,
        cano_template_lr=cfg.model.cano_template_lr,
        warping_field_lr=cfg.model.warping_field_lr,
        n_samples=cfg.n_samples,
        loss_weights=(cfg.model.img_loss_weight, cfg.model.occ_loss_weight,
                      cfg.model.geo_offset_reg_loss_weight,
                      cfg.model.tex_offset_reg_loss_weight))
    state = trainer.init_state(variables)
    if cfg.training.net_ckpt:
        state = ckpt.load_train_state(cfg.training.net_ckpt, state)
    state = trainer.fit(ds, cfg.training.start_epoch, cfg.training.end_epoch,
                        cfg.training.batch_size, state,
                        ckpt_interval=cfg.training.ckpt_interval)
    if cfg.training.finetune_tex:
        from avatarcap_tpu.train.finetune import finetune_texture_template
        finetune_texture_template(cfg, module, statics, ds, state)


def run_avatarcap(cfg, w_recon=True, w_nerf=False, save_avatar_mesh=False,
                  save_final_mesh=False, interval=1, view_idx=0, stream=0,
                  frame_idx=None):
    """reference main.py:275-504.

    stream > 0 runs the frame-batched streaming pipeline
    (pipeline/streaming.py) with that many frames per device instead of
    the frame-at-a-time loop; outputs are identical per frame.
    frame_idx targets one single frame (reference main.py:525's
    frame_idx kwarg); None processes every interval-th frame.
    """
    import jax
    import jax.numpy as jnp
    import cv2 as cv
    from avatarcap_tpu.models.avatar import GeoTexAvatar
    from avatarcap_tpu.models.recon import ReconNetwork
    from avatarcap_tpu.pipeline.capture import (
        AvatarCapture, CaptureGrid, CaptureOptions)
    from avatarcap_tpu.train import checkpoints as ckpt
    from avatarcap_tpu.data.mesh_io import save_ply
    from avatarcap_tpu.data.image_io import load_float_image
    from avatarcap_tpu.render.camera import calc_front_mv, calc_back_mv

    out_dir = cfg.testing.output_dir
    for sub in ("cano_avatar", "live_avatar", "live_recon"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    ds, statics, smpl_params = _load_subject(
        cfg, cfg.testing.testing_data_dir, False)
    module = GeoTexAvatar(
        pos_encoding_template=cfg.model.cano_template_pos_encoding,
        pos_encoding_warp=cfg.model.warping_field_pos_encoding,
        if_type=cfg.if_type)
    item0 = ds[0]
    template_vars = jax.jit(module.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 3)),
        jnp.asarray(item0["smpl_pos_map"])[None],
        statics.cano_smpl_center[None])
    avatar_vars = ckpt.load_network(cfg.testing.net_ckpt, template_vars) \
        if cfg.testing.net_ckpt else template_vars
    tex_vars = (ckpt.load_network(cfg.testing.net_ckpt_finetuned,
                                  template_vars)
                if cfg.testing.net_ckpt_finetuned else avatar_vars)

    recon = recon_vars = None
    if w_recon and cfg.testing.recon_net_ckpt:
        recon = ReconNetwork()
        rt = jax.jit(recon.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 512, 512, 6)),
                                 jnp.zeros((1, 8, 3)), jnp.zeros((1, 3)))
        recon_vars = ckpt.load_pytree(
            os.path.join(cfg.testing.recon_net_ckpt, "recon_net.msgpack"), rt)

    grid = CaptureGrid(
        valid_pts=jnp.asarray(ds.valid_pts),
        valid_idx=jnp.asarray(ds.valid_pts_idx),
        prior_volume=jnp.asarray(ds.prior_volume),
        vol_res=tuple(cfg.testing.vol_res))
    opt_kw = {"iso_value": cfg.iso_value,
              "render_res": cfg.testing.render_res}
    if cfg.testing.max_tris:
        opt_kw["max_tris"] = cfg.testing.max_tris
    if cfg.testing.max_active:
        opt_kw["max_active"] = cfg.testing.max_active
    capture = AvatarCapture(module, avatar_vars, statics, grid,
                            recon=recon, recon_vars=recon_vars,
                            avatar_tex_vars=tex_vars,
                            options=CaptureOptions(**opt_kw))

    cam = ds.data_config["camera"]
    data_num = len(ds) // ds.img_num_per_pose
    front_mv = back_mv = None

    def load_frame(i):
        item = ds[i * ds.img_num_per_pose + view_idx]
        data_idx = item["data_idx"]
        inferred_normal = None
        if w_recon and recon is not None:
            if ds.data_config["data_type"] == "synthetic":
                p = os.path.join(ds.data_dir,
                                 f"imgs/{data_idx:03d}/"
                                 f"normal_view_{view_idx:03d}.exr")
            else:
                p = os.path.join(ds.data_dir,
                                 f"imgs/normal/normal_{data_idx:04d}.exr")
            inferred_normal = load_float_image(p)
        return item, inferred_normal

    def save_frame(data_idx, results):
        nonlocal front_mv, back_mv
        if bool(np.asarray(results["overflow"])):
            # a static capacity (query refine, MC tris/active, raster
            # candidates, big-tri slots) was hit: geometry was dropped.
            # Raise CaptureOptions capacities for this subject.
            print(f"WARNING: frame {data_idx}: capacity overflow — "
                  "output mesh/renders are missing geometry")

        # save canonical avatar render (reference main.py:372-375)
        front, back = results["cano_phong"]
        img = np.concatenate([np.asarray(front), np.asarray(back)], 1)
        cv.imwrite(os.path.join(out_dir, "cano_avatar", f"{data_idx:04d}.jpg"),
                   (255 * img[..., ::-1]).astype(np.uint8))

        live = results["live_mesh"]
        lv = np.asarray(live.vertices[: 3 * int(live.num_tris)])
        if front_mv is None:
            front_mv = calc_front_mv(lv, rot_x_angle=-0.15)
            back_mv = calc_back_mv(lv, rot_x_angle=-0.15)
        lf, lb = capture.render_live(live, jnp.asarray(front_mv),
                                     jnp.asarray(back_mv))
        img = np.concatenate([np.asarray(lf), np.asarray(lb)], 1)
        cv.imwrite(os.path.join(out_dir, "live_avatar", f"{data_idx:04d}.jpg"),
                   (255 * img[..., ::-1]).astype(np.uint8))

        if save_avatar_mesh:
            n = 3 * int(live.num_tris)
            faces = np.arange(n, dtype=np.int32).reshape(-1, 3)
            colors = (np.asarray(results["avatar_colors"][:n])
                      if w_nerf else None)
            save_ply(os.path.join(out_dir, f"{data_idx:04d}_avatar.ply"),
                     np.asarray(live.vertices[:n]), faces,
                     np.asarray(live.normals[:n]), colors)

        if w_recon and recon is not None:
            rec = results["live_recon_mesh"]
            rf, rb = capture.render_live(rec, jnp.asarray(front_mv),
                                         jnp.asarray(back_mv))
            img = np.concatenate([np.asarray(rf), np.asarray(rb)], 1)
            cv.imwrite(os.path.join(out_dir, "live_recon",
                                    f"{data_idx:04d}.jpg"),
                       (255 * img[..., ::-1]).astype(np.uint8))
            if save_final_mesh:
                n = 3 * int(rec.num_tris)
                faces = np.arange(n, dtype=np.int32).reshape(-1, 3)
                colors = (np.asarray(results["recon_colors"][:n])
                          if w_nerf else None)
                save_ply(os.path.join(out_dir, f"{data_idx:04d}_recon.ply"),
                         np.asarray(rec.vertices[:n]), faces,
                         np.asarray(rec.normals[:n]), colors)

    frame_ids = ([frame_idx] if frame_idx is not None
                 else list(range(0, data_num, interval)))
    use_recon = w_recon and recon is not None
    if stream > 0:
        # streaming path (reference main.py:348 loop): on ONE device the
        # pipelined sequential program dominates (2.38 vs 1.94 frames/s
        # on a v5e — vmap serializes a batch's stages on one chip, see
        # PERFORMANCE.md r5); on a multi-device mesh frames shard over
        # the data axis via the batched program
        from avatarcap_tpu.parallel.mesh import make_mesh
        from avatarcap_tpu.pipeline.streaming import StreamingCapture
        if not frame_ids:
            print("run_avatarcap: no frames to process")
            return
        if use_recon:
            img_hw = load_frame(frame_ids[0])[1].shape[:2]
        else:
            img_hw = (cfg.testing.render_res, cfg.testing.render_res)
        devices = jax.devices()
        sc = StreamingCapture(capture, make_mesh(devices),
                              camera=cam, image_size=img_hw,
                              frames_per_device=stream,
                              w_recon=use_recon, w_nerf=w_nerf,
                              neck_vertex_idx=3068)
        single = len(devices) == 1
        # load + feed one streaming batch at a time: a long sequence
        # never holds more than sc.batch decoded frames on the host
        for start in range(0, len(frame_ids), sc.batch):
            pairs = [load_frame(i)
                     for i in frame_ids[start:start + sc.batch]]
            runner = sc.run_pipelined if single else sc.run
            res_list = runner(
                [p[0] for p in pairs],
                inferred_normals=([p[1] for p in pairs] if use_recon
                                  else None))
            for (item, _), results in zip(pairs, res_list):
                save_frame(item["data_idx"], results)
    else:
        for i in frame_ids:
            item, inferred_normal = load_frame(i)
            results = capture.process_frame(
                item, w_recon=use_recon, w_nerf=w_nerf,
                inferred_normal=inferred_normal, neck_vertex_idx=3068,
                camera=cam)
            save_frame(item["data_idx"], results)


def main():
    from avatarcap_tpu.config import load_config

    parser = ArgumentParser()
    parser.add_argument("-c", "--config_path", type=str, required=True,
                        help="Configuration file path.")
    parser.add_argument("-m", "--mode", type=str, default="test",
                        choices=["train", "test"], help="Train or test.")
    parser.add_argument("--stream", type=int, default=0, metavar="N",
                        help="test mode: process frames through the "
                             "batched streaming pipeline, N frames per "
                             "device (0 = frame-at-a-time).")
    # the reference hard-codes these as run_avatarcap(...) kwargs in its
    # __main__ (reference main.py:523-529); expose them as flags
    parser.add_argument("--nerf", action="store_true",
                        help="test mode: also evaluate NeRF vertex "
                             "colors (textured results).")
    parser.add_argument("--save-avatar-mesh", action="store_true",
                        help="save animated GeoTexAvatar results as PLY.")
    parser.add_argument("--save-final-mesh", action="store_true",
                        help="save reconstructed AvatarCap results as PLY.")
    parser.add_argument("--interval", type=int, default=1,
                        help="frame interval for reconstruction.")
    parser.add_argument("--view-idx", type=int, default=0,
                        help="view index (synthetic multi-view data).")
    parser.add_argument("--frame-idx", type=int, default=None,
                        help="test mode: process only this single frame "
                             "(reference main.py:525 frame_idx).")
    args = parser.parse_args()
    np.random.seed(31359)
    cfg = load_config(args.config_path)
    if args.mode == "train":
        train_avatar(cfg)
    else:
        run_avatarcap(cfg, w_recon=True, w_nerf=args.nerf,
                      save_avatar_mesh=args.save_avatar_mesh,
                      save_final_mesh=args.save_final_mesh,
                      interval=args.interval, view_idx=args.view_idx,
                      stream=args.stream, frame_idx=args.frame_idx)


if __name__ == "__main__":
    main()
