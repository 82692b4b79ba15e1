"""Texture template finetuning (reference main.py:162-272).

Freezes everything except the canonical template; optimizes Adam(5e-4) on
one scan's views; geometry is anchored by an L1 loss against the frozen
initial network's occupancy predictions; total = img + 0.5 * geo.
"""

from __future__ import annotations

import functools
import json
import os
import time
import jax
import jax.numpy as jnp
import numpy as np
import optax

from avatarcap_tpu.models.avatar import GeoTexAvatar
from avatarcap_tpu.pipeline.avatar import (
    AvatarStatics, FrameInputs, _forward_impl)
from avatarcap_tpu.ops.volume_render import (
    raw2outputs, stratified_z_vals, z_vals_to_dists)
from avatarcap_tpu.train import checkpoints as ckpt
from avatarcap_tpu.train.trainer import TrainState


def make_finetune_step(module: GeoTexAvatar, optimizer,
                       statics: AvatarStatics, n_samples: int = 64):
    def loss_fn(params, batch_stats, init_variables, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        frame = FrameInputs(batch["live_smpl_v"],
                            batch["cano2live_jnt_mats"],
                            batch["smpl_pos_map"])

        def fwd(m, do_train):
            feat = m.pose_features(frame.smpl_pos_map, do_train)
            center = jnp.broadcast_to(statics.cano_smpl_center[None],
                                      (batch["cano_pts"].shape[0], 3))
            occ_off = m.query_offsets(batch["cano_pts"], feat, center,
                                      do_train)
            _, _, occ = m.query_template(batch["cano_pts"] + occ_off)
            near = batch["near"]
            far = batch["far"]
            depth = batch["depth"]
            has_depth = depth > 1e-6
            near = jnp.where(has_depth, depth - 0.05, near)
            far = jnp.where(has_depth, depth + 0.05, far)
            z_vals = stratified_z_vals(near, far, n_samples, True, rng)
            B, R = near.shape
            wpts = (batch["ray_o"][:, :, None]
                    + batch["ray_d"][:, :, None] * z_vals[..., None])
            dists = z_vals_to_dists(z_vals)
            out = _forward_impl(m, wpts.reshape(B, R * n_samples, 3),
                                dists.reshape(B, R * n_samples), feat,
                                frame, statics, "posed", do_train)
            ro = raw2outputs(out["raw"].reshape(B * R, n_samples, 4),
                             z_vals.reshape(B * R, n_samples))
            return occ, ro.rgb_map.reshape(B, R, 3)

        (occ, rgb_map), updates = module.apply(
            variables, method=lambda m: fwd(m, True),
            mutable=["batch_stats"])
        # frozen initial network anchor (reference main.py:228-235)
        occ_init, _ = module.apply(init_variables,
                                   method=lambda m: fwd(m, False))
        occ_init = jax.lax.stop_gradient(occ_init)

        img_loss = jnp.mean(jnp.square(rgb_map - batch["rgb"]))
        geo_loss = jnp.mean(jnp.abs(occ - occ_init))
        total = img_loss + 0.5 * geo_loss
        return total, ({"tex_loss": img_loss, "geo_loss": geo_loss,
                        "total_loss": total}, updates["batch_stats"])

    # state donated (rebound every step); init_variables is the frozen
    # anchor reused across steps, so it must NOT be donated
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, init_variables, batch, rng):
        (_, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   init_variables, batch, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, new_stats, opt_state,
                          state.step + 1), metrics

    return step


def finetune_texture_template(cfg, module: GeoTexAvatar,
                              statics: AvatarStatics, dataset,
                              state: TrainState,
                              end_epoch: int = 1000,
                              log_fn=print, batch_size: int = 4,
                              num_workers: int = 3) -> TrainState:
    """Host loop (reference main.py:162-272): 1000 epochs over one scan's
    views; Adam 5e-4 on cano_template only; checkpoints every 20 epochs.

    Views are stacked into batches of ``batch_size`` (the reference steps
    one view at a time — 60k dispatches over the schedule; batching gives
    4x fewer dispatches and a full-width device step) and decoded on a
    small thread pool, with metric readback delayed one step so the host
    never stalls the device (VERDICT r2 items 4/8)."""
    # only-train-template mask (reference main.py:179-185)
    def label_fn(params):
        return jax.tree.map_with_path(
            lambda path, _: "train" if path[0].key == "cano_template"
            else "freeze", params)

    optimizer = optax.multi_transform(
        {"train": optax.adam(5e-4), "freeze": optax.set_to_zero()}, label_fn)
    step_fn = make_finetune_step(module, optimizer, statics,
                                 n_samples=cfg.n_samples)

    # REAL copies everywhere the caller's buffers would otherwise flow
    # into the DONATED TrainState: the frozen anchor must survive every
    # step, and the caller's `state` (often aliasing its original
    # `variables`) must survive the first step
    init_variables = {"params": jax.tree.map(jnp.copy, state.params),
                      "batch_stats": jax.tree.map(jnp.copy,
                                                  state.batch_stats)}
    ft_params = jax.tree.map(jnp.copy, state.params)
    ft_state = TrainState(ft_params,
                          jax.tree.map(jnp.copy, state.batch_stats),
                          optimizer.init(ft_params),
                          jnp.zeros((), jnp.int32))

    ft_idx = cfg.training.finetune_tex_data_idx
    rel = dataset.data_indices.index(ft_idx)
    indices = list(range(dataset.img_num_per_pose * rel,
                         dataset.img_num_per_pose * (rel + 1)))

    out_dir = os.path.join(cfg.training.net_ckpt_dir, "finetune_tex")
    os.makedirs(out_dir, exist_ok=True)
    rng = jax.random.PRNGKey(314)
    nprng = np.random.RandomState(314)
    batch_size = max(1, min(batch_size, len(indices)))
    from concurrent.futures import ThreadPoolExecutor
    pool = ThreadPoolExecutor(max_workers=max(1, num_workers))

    def build_batch(idxs, seed0):
        futs = [pool.submit(dataset.__getitem__, int(ix),
                            np.random.RandomState(seed0 + 7919 * j))
                for j, ix in enumerate(idxs)]
        items = [f.result() for f in futs]
        return {k: jnp.asarray(np.stack([it[k] for it in items]))
                for k, v in items[0].items() if isinstance(v, np.ndarray)}

    def log_metrics(epoch_idx, batch_idx, metrics):
        # delayed one step by the caller: float() syncs the PREVIOUS
        # step while the current one runs
        with open(os.path.join(out_dir, "loss.jsonl"), "a") as f:
            f.write(json.dumps({"epoch": epoch_idx, "batch": batch_idx,
                                **{k: float(v)
                                   for k, v in metrics.items()}}) + "\n")

    prev = None
    for epoch_idx in range(end_epoch):
        t0 = time.time()
        nprng.shuffle(indices)
        n_batches = max(1, len(indices) // batch_size)
        for batch_idx in range(n_batches):
            idxs = indices[batch_idx * batch_size:
                           (batch_idx + 1) * batch_size]
            batch = build_batch(idxs, 314 + epoch_idx * 100003
                                + batch_idx * 131)
            rng, r = jax.random.split(rng)
            ft_state, metrics = step_fn(ft_state, init_variables, batch, r)
            if prev is not None:
                log_metrics(*prev)
            prev = (epoch_idx, batch_idx, metrics)
        log_fn(f"finetune epoch {epoch_idx} took {time.time() - t0:.1f} s")
        if epoch_idx % 20 == 0 and epoch_idx > 0:
            ckpt.save_train_state(
                os.path.join(out_dir, f"epoch_{epoch_idx}"), ft_state)
    if prev is not None:
        log_metrics(*prev)
    pool.shutdown()
    ckpt.save_train_state(os.path.join(out_dir, "epoch_latest"), ft_state)
    return ft_state
