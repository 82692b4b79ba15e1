"""Avatar training (reference main.py:28-159) and texture finetuning
(reference main.py:162-272) as jitted steps.

Faithful training semantics:
- Adam with two param groups: cano_template lr 1e-3 (Step /2 every 5000
  iters, floored at 5e-4) and warping_field lr 1e-4 (Step /2 every 20000,
  floored at 5e-5, forced to 0 for epoch 0) — reference main.py:38-89.
- losses: MSE rgb + (L1 sdf | BCE occ) + offset-norm regularizers with
  weights 1.0 / 0.5 / 0.05 / 0.05 — reference main.py:45-50, 102-112.
- SDF targets clipped to +-0.1 and normalized — reference main.py:103-104.

TPU-first: one jitted train_step per batch; learning rates enter as traced
scalars so per-epoch LR policy never retriggers compilation; BN running
stats thread through the three forward passes exactly as torch would
(pose features -> occupancy query -> ray render).
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import time
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from avatarcap_tpu.models.avatar import GeoTexAvatar
from avatarcap_tpu.pipeline.avatar import (
    AvatarStatics, FrameInputs, _forward_impl)
from avatarcap_tpu.ops.volume_render import (
    raw2outputs, stratified_z_vals, z_vals_to_dists)
from avatarcap_tpu.train.schedules import StepSchedule
from avatarcap_tpu.train import checkpoints as ckpt


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def _bce(pred, target, eps=1e-7):
    p = jnp.clip(pred, eps, 1.0 - eps)
    return -(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))


def make_train_step(module: GeoTexAvatar, optimizer, statics: AvatarStatics,
                    if_type: str = "sdf", sdf_thres: float = 0.1,
                    n_samples: int = 64, perturb: bool = True,
                    loss_weights=(1.0, 0.5, 0.05, 0.05)):
    """Build the jitted avatar train step.

    The returned function signature:
      (state, batch, lrs (2,), rng) -> (state, metrics)
    where batch is a dict of device arrays with keys matching the dataset
    contract and lrs = [cano_template_lr, warping_field_lr].
    """
    img_w, occ_w, geo_reg_w, tex_reg_w = loss_weights

    def loss_fn(params, batch_stats, batch, lrs, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        frame = FrameInputs(batch["live_smpl_v"],
                            batch["cano2live_jnt_mats"],
                            batch["smpl_pos_map"])

        def fwd(m):
            feat = m.pose_features(frame.smpl_pos_map, True)
            # geometry supervision (reference main.py:98)
            center = jnp.broadcast_to(statics.cano_smpl_center[None],
                                      (batch["cano_pts"].shape[0], 3))
            occ_offsets = m.query_offsets(batch["cano_pts"], feat, center,
                                          True)
            _, _, occ_pred = m.query_template(batch["cano_pts"] + occ_offsets)
            # nerf rendering (reference main.py:99)
            near = batch["near"]
            far = batch["far"]
            depth = batch["depth"]
            has_depth = depth > 1e-6
            near = jnp.where(has_depth, depth - 0.05, near)
            far = jnp.where(has_depth, depth + 0.05, far)
            z_vals = stratified_z_vals(near, far, n_samples, perturb, rng)
            B, R = near.shape
            wpts = (batch["ray_o"][:, :, None]
                    + batch["ray_d"][:, :, None] * z_vals[..., None])
            dists = z_vals_to_dists(z_vals)
            out = _forward_impl(m, wpts.reshape(B, R * n_samples, 3),
                                dists.reshape(B, R * n_samples), feat,
                                frame, statics, "posed", True)
            ro = raw2outputs(out["raw"].reshape(B * R, n_samples, 4),
                             z_vals.reshape(B * R, n_samples))
            return (occ_pred, occ_offsets, ro.rgb_map.reshape(B, R, 3),
                    out["nonrigid_offset"])

        (occ_pred, occ_offsets, rgb_map, nerf_offsets), updates = \
            module.apply(variables, method=lambda m: fwd(m),
                         mutable=["batch_stats"])

        img_loss = jnp.mean(jnp.square(rgb_map - batch["rgb"]))
        target_ov = batch["cano_pts_ov"]
        if if_type == "sdf":
            target_ov = jnp.clip(target_ov, -sdf_thres, sdf_thres) / sdf_thres
            geo_loss = jnp.mean(jnp.abs(occ_pred[..., 0] - target_ov))
        else:
            target_ov = (target_ov > 0).astype(occ_pred.dtype)
            geo_loss = jnp.mean(_bce(occ_pred[..., 0], target_ov))
        geo_reg = jnp.mean(jnp.linalg.norm(occ_offsets, axis=-1))
        tex_reg = jnp.mean(jnp.linalg.norm(nerf_offsets, axis=-1))
        total = (img_w * img_loss + occ_w * geo_loss
                 + geo_reg_w * geo_reg + tex_reg_w * tex_reg)
        metrics = {"tex_loss": img_loss, "geo_loss": geo_loss,
                   "geo_offset_reg_loss": geo_reg,
                   "tex_offset_reg_loss": tex_reg, "total_loss": total}
        return total, (metrics, updates["batch_stats"])

    # state is DONATED: params + Adam m/v round-trip every step, so XLA
    # aliases their HBM pages into the outputs instead of holding both
    # generations live (PREFLIGHT had alias_gb == 0 everywhere, r4).
    # Callers always rebind (state = train_step(state, ...)).
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, lrs, rng):
        (_, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   lrs, rng)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params,
            hyperparams={"lrs": lrs})
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, new_stats, opt_state,
                          state.step + 1), metrics

    return train_step


def make_optimizer():
    """Two-group Adam whose learning rates are traced per-step inputs.

    optax.multi_transform over param labels; each group is Adam scaled by
    an injected lr (so the host-side epoch LR policy costs no recompiles).
    """
    def label_fn(params):
        return jax.tree.map_with_path(
            lambda path, _: "template" if path[0].key == "cano_template"
            else "warp", params)

    def scaled_adam(group_idx):
        return optax.chain(
            optax.scale_by_adam(),
            _scale_by_input_lr(group_idx),
        )

    tx = optax.multi_transform(
        {"template": scaled_adam(0), "warp": scaled_adam(1)}, label_fn)
    return _with_hyperparams(tx)


class _InjectedLrState(NamedTuple):
    pass


def _scale_by_input_lr(group_idx: int):
    """Scale updates by -lrs[group_idx], where lrs arrives via the
    update(..., hyperparams=...) side channel installed below."""

    def init_fn(params):
        return _InjectedLrState()

    def update_fn(updates, state, params=None, *, lrs=None):
        lr = lrs[group_idx]
        return jax.tree.map(lambda u: -lr * u, updates), state

    return optax.GradientTransformationExtraArgs(init_fn, update_fn)


def _with_hyperparams(tx):
    """Adapter: route a {'lrs': ...} kwarg down to _scale_by_input_lr."""

    def init_fn(params):
        return tx.init(params)

    def update_fn(updates, state, params=None, hyperparams=None):
        lrs = hyperparams["lrs"]
        return tx.update(updates, state, params, lrs=lrs)

    return optax.GradientTransformationExtraArgs(init_fn, update_fn)


@dataclasses.dataclass
class AvatarTrainer:
    """Host-side orchestration of the training loop
    (reference main.py:28-159)."""

    module: GeoTexAvatar
    statics: AvatarStatics
    net_ckpt_dir: str
    if_type: str = "sdf"
    cano_template_lr: float = 1e-3
    warping_field_lr: float = 1e-4
    n_samples: int = 64
    loss_weights: tuple = (1.0, 0.5, 0.05, 0.05)
    log_name: str = "train"

    def __post_init__(self):
        self.optimizer = make_optimizer()
        self.train_step = make_train_step(
            self.module, self.optimizer, self.statics, self.if_type,
            n_samples=self.n_samples, loss_weights=self.loss_weights)
        self.lr_schedule_template = StepSchedule(self.cano_template_lr,
                                                 5000, 0.5)
        self.lr_schedule_warp = StepSchedule(self.warping_field_lr,
                                             20000, 0.5)

    def init_state(self, variables) -> TrainState:
        # COPY into the state: train_step donates its TrainState, so
        # sharing the caller's buffers would delete `variables` after
        # the first step (callers compare against them; one-time copy)
        params = jax.tree.map(jnp.copy, variables["params"])
        stats = jax.tree.map(jnp.copy, variables.get("batch_stats", {}))
        return TrainState(params, stats, self.optimizer.init(params),
                          jnp.zeros((), jnp.int32))

    def epoch_lrs(self, epoch_idx: int, batch_num: int) -> np.ndarray:
        """Per-epoch LR policy (reference main.py:80-89)."""
        it = epoch_idx * batch_num
        lr_t = max(5e-4, self.lr_schedule_template(it))
        lr_w = 0.0 if epoch_idx < 1 else max(5e-5, self.lr_schedule_warp(it))
        return np.array([lr_t, lr_w], np.float32)

    def fit(self, dataset, start_epoch: int, end_epoch: int,
            batch_size: int, state: TrainState,
            ckpt_interval: int = 10, seed: int = 31359,
            log_fn=print, num_workers: int = 3) -> TrainState:
        from avatarcap_tpu.utils.tb_logging import ScalarLogger
        os.makedirs(self.net_ckpt_dir, exist_ok=True)
        # JSONL + TensorBoard scalars per batch and epoch means per epoch
        # (reference main.py:125-141)
        logger = ScalarLogger(self.net_ckpt_dir, self.log_name)
        batch_num = max(1, len(dataset) // batch_size)
        rng = jax.random.PRNGKey(seed)
        lr0, lr1 = 0.0, 0.0

        def log_metrics(epoch_idx, batch_idx, metrics):
            # float() forces the device sync; by logging step k-1 after
            # dispatching step k, the host decodes/uploads the next batch
            # while the device still runs — no per-step stall (the
            # tunneled runtime pays ~36 ms per readback).
            m = {k: float(v) for k, v in metrics.items()}
            for k, v in m.items():
                epoch_losses[k] = epoch_losses.get(k, 0.0) + v
            log_fn(f"epoch {epoch_idx}, batch {batch_idx}, "
                   f"lr: {lr0:.2e}, {lr1:.2e}, "
                   + ", ".join(f"{k}: {v:.6f}" for k, v in m.items()))
            logger.log(m, step=epoch_idx * batch_num + batch_idx,
                       extra={"epoch": epoch_idx, "batch": batch_idx})

        for epoch_idx in range(start_epoch, end_epoch):
            lrs = jnp.asarray(self.epoch_lrs(epoch_idx, batch_num))
            lr0, lr1 = float(lrs[0]), float(lrs[1])
            t_epoch = time.time()
            epoch_losses: Dict[str, float] = {}
            prev = None
            for batch_idx, batch in enumerate(
                    dataset.batches(batch_size, shuffle=True,
                                    seed=seed + epoch_idx,
                                    num_workers=num_workers)):
                rng, step_rng = jax.random.split(rng)
                dev_batch = {k: jnp.asarray(v) for k, v in batch.items()
                             if isinstance(v, np.ndarray)
                             and v.dtype != np.object_}
                state, metrics = self.train_step(state, dev_batch, lrs,
                                                 step_rng)
                if prev is not None:
                    log_metrics(epoch_idx, batch_idx - 1, prev)
                prev = metrics
            if prev is not None:
                log_metrics(epoch_idx, batch_num - 1, prev)
            logger.log({f"epoch/{k}": v / batch_num
                        for k, v in epoch_losses.items()}, step=epoch_idx,
                       extra={"epoch": epoch_idx, "batch": -1})
            logger.flush()
            log_fn(f"epoch {epoch_idx} took {time.time() - t_epoch:.1f} s")

            if epoch_idx % ckpt_interval == 0:
                ckpt.save_train_state(
                    os.path.join(self.net_ckpt_dir, f"epoch_{epoch_idx}"),
                    state)
            ckpt.save_train_state(
                os.path.join(self.net_ckpt_dir, "epoch_latest"), state)
        return state
