"""AvatarCap dataset: scan/video indexing and per-item assembly.

Equivalent of the reference dataset (reference dataset/avatarcap_dataset.py)
with the same on-disk layout (dataConfig.yaml, smpl/pose_*.txt,
smpl/shape.txt, smpl/smpl_pos_map_*.exr, imgs/..., cano_pts_ov/*.npz) and
the same per-item contract. Differences, TPU-motivated:

- SMPL FK runs through the JAX model (vmappable); the reference reruns a
  numpy FK per item on the host (dataset/avatarcap_dataset.py:197).
- The test-time grid keeps static shapes: valid (near-SMPL) points are
  marked by a mask over the full grid rather than boolean-compacted.
- trimesh.contains is replaced by the device ray-parity inside test.
"""

from __future__ import annotations

import glob
import math
import os
import threading

os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")

import cv2 as cv  # noqa: E402
import numpy as np  # noqa: E402
import yaml  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from avatarcap_tpu.body.smpl import (  # noqa: E402
    SmplParams, smpl_forward_batch, canonical_pose)
from avatarcap_tpu.data.ray_sampling import sample_rays  # noqa: E402
from avatarcap_tpu.ops.knn import knn  # noqa: E402
from avatarcap_tpu.ops.inside import points_inside_mesh  # noqa: E402
from avatarcap_tpu.data.image_io import load_float_image  # noqa: E402

SAMPLED_RAY_NUM = 1024      # reference dataset/avatarcap_dataset.py:239
SURFACE_PTS_PER_ITEM = 5000  # reference :285
VOLUME_PTS_PER_ITEM = SURFACE_PTS_PER_ITEM // 16  # reference :286

# Forked process-pool workers inherit the dataset through this module
# global (set by AvatarCapDataset._fork_pool immediately before the
# fork) — submitting a bound method would pickle the whole dataset per
# task. One active fork-pool dataset per process is sufficient: pools
# are short-lived (one epoch iterator) and re-fork on each call.
_FORK_DATASET = None


def _fork_getitem(index: int, seed: int, light: bool):
    return _FORK_DATASET.__getitem__(
        index, np.random.RandomState(seed), light=light)


class AvatarCapDataset:
    def __init__(self, data_dir: str, training: bool,
                 smpl_params: SmplParams,
                 vol_res=(384, 384, 128),
                 training_data_ids=None,
                 pos_map_builder=None):
        self.data_dir = data_dir
        self.training = training
        self.smpl_params = smpl_params

        with open(os.path.join(data_dir, "dataConfig.yaml"),
                  encoding="UTF-8") as f:
            self.data_config = yaml.safe_load(f)

        self.smpl_pose_list = sorted(
            glob.glob(os.path.join(data_dir, "smpl/pose_*.txt")))
        self.data_type = self.data_config.get("data_type", "synthetic")
        if self.data_type == "synthetic":
            self.color_img_list = sorted(glob.glob(
                os.path.join(data_dir, "imgs/*/color_view_*.jpg")))
            self.depth_img_list = sorted(glob.glob(
                os.path.join(data_dir, "imgs/*/depth_view_*.png")))
            self.mask_img_list = sorted(glob.glob(
                os.path.join(data_dir, "imgs/*/mask_view_*.png")))
        elif self.data_type == "real":
            self.color_img_list = sorted(glob.glob(
                os.path.join(data_dir, "imgs/color/color_*.jpg")))
            self.depth_img_list = []
            self.mask_img_list = sorted(glob.glob(
                os.path.join(data_dir, "imgs/mask/mask_*.png")))
        else:
            raise ValueError(f"Invalid data type: {self.data_type}")

        self.img_num_per_pose = max(
            1, len(self.color_img_list) // max(1, len(self.smpl_pose_list)))
        self.start_data_idx = self._pose_idx(self.smpl_pose_list[0])

        self.smpl_shape = np.loadtxt(
            os.path.join(data_dir, "smpl/shape.txt")).astype(np.float32)

        # ONE compiled FK program serves init, preload, and the per-item
        # path. Eager jax FK is ~830 primitive dispatches; through the
        # tunneled TPU runtime that is seconds of RTT per call, so every FK
        # here goes through this jit and results are cached per pose
        # (the reference reruns a numpy FK per item,
        # dataset/avatarcap_dataset.py:197).
        import jax as _jax

        def _fk3(poses):
            # only the three consumed leaves: the full SmplOutput also
            # carries per-vertex affine mats (~0.44 MB/pose x N poses in
            # the preload warm-up batch) that nothing here reads
            out = smpl_forward_batch(smpl_params, poses,
                                     jnp.asarray(self.smpl_shape))
            return out.vertices, out.joints, out.jnt_affine_mats

        self._fk_batch = _jax.jit(_fk3)
        self._fk_cache = {}
        self._fk_lock = threading.Lock()

        # canonical SMPL (reference :61-70)
        cano_v, cano_j, cano_m = self._fk_batch(canonical_pose()[None])
        self.cano_smpl_v = np.asarray(cano_v[0])
        self.cano_smpl_jnts = np.asarray(cano_j[0])
        self.inv_cano_jnt_mats = np.linalg.inv(np.asarray(cano_m[0]))
        self.cano_smpl_center = 0.5 * (self.cano_smpl_v.min(0)
                                       + self.cano_smpl_v.max(0))

        # pos-map pose transforms (reference :73-87)
        self.pos_map_name = self.data_config.get("pos_map_name", "cano")
        self.pos_map_res = self.data_config.get("pos_map_res", 256)
        J = smpl_params.num_joints
        if self.pos_map_name == "cano":
            self.cano2posmap_jnt_mats = np.tile(np.eye(4, dtype=np.float32),
                                                (J, 1, 1))
        elif self.pos_map_name == "A":
            pose = np.zeros(3 + 3 * J, np.float32)
            pose[3 + 16 * 3 + 2] = -math.radians(60)
            pose[3 + 17 * 3 + 2] = math.radians(60)
            amats = np.asarray(self._fk_batch(pose[None])[2][0])
            self.cano2posmap_jnt_mats = amats @ self.inv_cano_jnt_mats
        else:
            raise ValueError(f"Invalid pos_map_name: {self.pos_map_name}")

        # canonical bounds: pad 5 cm xy / 15 cm z (reference :89-97)
        min_xyz = self.cano_smpl_v.min(0)
        max_xyz = self.cano_smpl_v.max(0)
        min_xyz[:2] -= 0.05
        max_xyz[:2] += 0.05
        min_xyz[2] -= 0.15
        max_xyz[2] += 0.15
        self.cano_bounds = np.stack([min_xyz, max_xyz]).astype(np.float32)

        cam = self.data_config["camera"]
        self.K = np.array([[cam["fx"], 0, cam["cx"]],
                           [0, cam["fy"], cam["cy"]],
                           [0, 0, 1]], np.float32)
        self.img_w = cam["img_width"]
        self.img_h = cam["img_height"]

        if not training:
            self._init_test_grid(vol_res)

        if training and training_data_ids is not None:
            ids = set(int(i) for i in np.atleast_1d(training_data_ids))
            self.smpl_pose_list = [
                p for p in self.smpl_pose_list if self._pose_idx(p) in ids]

            def img_in(path):
                return int(os.path.basename(
                    os.path.dirname(path))) in ids
            self.color_img_list = list(filter(img_in, self.color_img_list))
            self.depth_img_list = list(filter(img_in, self.depth_img_list))
            self.mask_img_list = list(filter(img_in, self.mask_img_list))

        if training:
            self._preload_training_data()

    # -- helpers ---------------------------------------------------------

    @staticmethod
    def _pose_idx(pose_path: str) -> int:
        name = os.path.splitext(os.path.basename(pose_path))[0]
        return int(name.replace("pose_", ""))

    def _init_test_grid(self, vol_res):
        """Full static grid + near-SMPL validity mask + inside prior for
        invalid points (reference :109-125, static-shape version)."""
        self.vol_res = tuple(vol_res)
        lin = [np.linspace(0, 1, r, dtype=np.float32) for r in vol_res]
        g = np.stack(np.meshgrid(*lin, indexing="ij"), axis=-1).reshape(-1, 3)
        pts = g * (self.cano_bounds[1] - self.cano_bounds[0]) \
            + self.cano_bounds[0]
        d2, _ = knn(jnp.asarray(pts), jnp.asarray(self.cano_smpl_v), k=1)
        self.infer_pts_flag = np.asarray(d2[:, 0] < 0.1 ** 2)
        self.infer_pts = pts  # full grid, masked downstream

        tris = self.cano_smpl_v[self.smpl_params.faces]
        inside = np.asarray(points_inside_mesh(jnp.asarray(pts),
                                               jnp.asarray(tris)))
        # occupancy in [-1, 1] (reference :124): +1 inside, -1 outside
        self.invalid_pts_ov = (2.0 * inside.astype(np.float32) - 1.0)

        # Static compacted layout for the capture pipeline: valid (near-SMPL)
        # points padded to a fixed size, plus their flat-grid indices and the
        # SMPL-prior volume used for everything else.
        idx = np.where(self.infer_pts_flag)[0].astype(np.int32)
        pad = (-len(idx)) % 65536
        self.valid_pts_idx = np.pad(idx, (0, pad),
                                    constant_values=len(pts))  # OOB -> drop
        self.valid_pts = np.concatenate(
            [pts[idx], np.zeros((pad, 3), np.float32)])
        self.num_valid_pts = len(idx)
        # base volume: invalid prior everywhere (valid entries overwritten)
        self.prior_volume = np.where(self.infer_pts_flag, 0.0,
                                     self.invalid_pts_ov).astype(np.float32)

    def _load_pos_map(self, data_idx: int) -> np.ndarray:
        """EXR pos map -> (H, W, 6) front/back stack (reference :159-162).
        Returned channels-last (NHWC-ready)."""
        path = os.path.join(
            self.data_dir,
            f"smpl/smpl_pos_map_{data_idx:04d}_{self.pos_map_name}.exr")
        try:
            m = load_float_image(path)
        except FileNotFoundError:
            m = load_float_image(os.path.join(
                self.data_dir, f"smpl/smpl_pos_map_{data_idx:04d}.exr"))
        r = self.pos_map_res
        m = cv.resize(m, (2 * r, r), interpolation=cv.INTER_NEAREST)
        return np.concatenate([m[:, :r, :], m[:, r:, :]],
                              axis=-1).astype(np.float32)

    def _preload_training_data(self):
        # Warm the FK cache for every training pose with ONE device call.
        if self.smpl_pose_list:
            poses = np.stack([self._load_live_pose(i)
                              for i in range(len(self.smpl_pose_list))])
            with self._fk_lock:
                for i, e in enumerate(self._fk_entries(poses)):
                    self._fk_cache[i] = e

        self.pos_maps = []
        self.presampled_data = []
        self.data_indices = []
        for pose_file in self.smpl_pose_list:
            idx = self._pose_idx(pose_file)
            self.pos_maps.append(self._load_pos_map(idx))
            data = np.load(os.path.join(self.data_dir,
                                        f"cano_pts_ov/{idx:03d}.npz"))
            self.presampled_data.append({k: data[k].copy() for k in data})
            self.data_indices.append(idx)

    def __len__(self):
        return len(self.smpl_pose_list) * self.img_num_per_pose

    def _load_live_pose(self, pose_idx: int) -> np.ndarray:
        live_pose = np.loadtxt(
            self.smpl_pose_list[pose_idx]).astype(np.float32)
        live_pose[3 + 22 * 3: 6 + 22 * 3] = 0.0
        live_pose[3 + 23 * 3: 6 + 23 * 3] = 0.0
        return live_pose

    def _fk_entries(self, poses: np.ndarray):
        """One batched device FK -> per-pose numpy cache entries.

        Entry arrays are frozen (writeable=False): __getitem__ hands the
        cached objects out by reference, so an in-place mutation by any
        consumer would silently corrupt every later item/epoch.
        """
        vs, _, ms = self._fk_batch(poses)
        live_vs = np.asarray(vs)
        jnt_mats = np.asarray(ms)
        entries = []
        for pose, live_v, mats in zip(poses, live_vs, jnt_mats):
            cano2live = (mats @ self.inv_cano_jnt_mats).astype(np.float32)
            live_bounds = np.stack([live_v.min(0) - 0.05,
                                    live_v.max(0) + 0.05]).astype(np.float32)
            entry = (pose, live_v.astype(np.float32), cano2live,
                     live_bounds)
            for a in entry:
                a.flags.writeable = False
            entries.append(entry)
        return entries

    def _live_fk(self, pose_idx: int):
        """(live_pose, live_v, cano2live_jnt_mats, live_bounds), memoized.

        Thread-safe for the prefetching loader; compute happens at most once
        per pose (training preloads every pose in one batched call)."""
        with self._fk_lock:
            hit = self._fk_cache.get(pose_idx)
        if hit is not None:
            return hit
        entry = self._fk_entries(
            self._load_live_pose(pose_idx)[None])[0]
        with self._fk_lock:
            return self._fk_cache.setdefault(pose_idx, entry)

    # -- item assembly ----------------------------------------------------

    def __getitem__(self, index: int, rng: np.random.RandomState = None,
                    light: bool = False):
        """Assemble one item. ``light`` omits the heavy PER-POSE arrays
        (pos map, live SMPL vertices, joint mats) and adds ``pose_idx``
        instead — the device_batches path keeps those cached on device,
        so shipping them per item would only re-pay the host->device
        tunnel (~25 MB/s) for constants."""
        if rng is None:
            rng = np.random
        pose_idx = index // self.img_num_per_pose
        view_idx = index % self.img_num_per_pose
        data_idx = self._pose_idx(self.smpl_pose_list[pose_idx])

        # live SMPL (hands zeroed, reference :194-198) — FK cached per pose
        # (views of the same pose share it; the item path stays jax-free).
        live_pose, live_v, cano2live, live_bounds = self._live_fk(pose_idx)

        if light:
            smpl_pos_map = None
        elif self.training:
            smpl_pos_map = self.pos_maps[pose_idx].copy()
        else:
            smpl_pos_map = self._load_pos_map(data_idx)

        # image + mask (reference :216-225)
        if self.training:
            color = cv.imread(self.color_img_list[index],
                              cv.IMREAD_UNCHANGED).astype(np.float32) / 255.0
            if not self.mask_img_list:
                mask = (np.linalg.norm(color, axis=-1) > 0).astype(np.uint8)
            else:
                mask = cv.imread(self.mask_img_list[index],
                                 cv.IMREAD_UNCHANGED)
        else:
            color = np.ones((self.img_h, self.img_w, 3), np.float32)
            mask = np.ones((self.img_h, self.img_w), np.uint8)

        # camera extrinsics (reference :227-237)
        cam_path = os.path.join(self.data_dir, f"imgs/{data_idx:03d}/cams.mat")
        w2c_RT = np.identity(4, np.float32)
        if os.path.exists(cam_path):
            import scipy.io as sio
            cam_data = sio.loadmat(cam_path)
            aa = np.float64(cam_data["cam_rs"][view_idx]).reshape(3)
            # host-side Rodrigues (same closed form as ops/se3); the item
            # path must stay free of eager jax dispatches
            w2c_RT[:3, :3] = cv.Rodrigues(aa)[0].astype(np.float32)
            w2c_RT[:3, 3] = np.float32(cam_data["cam_ts"][view_idx]).ravel()

        rays = sample_rays(color, mask, self.K, w2c_RT[:3, :3],
                           w2c_RT[:3, 3:], live_bounds, SAMPLED_RAY_NUM,
                           self.training, rng=rng)
        coord = rays["coord"]
        occupancy = mask[coord[:, 0], coord[:, 1]]
        if self.training and self.data_type == "synthetic" \
                and self.depth_img_list:
            depth_img = cv.imread(self.depth_img_list[index],
                                  cv.IMREAD_UNCHANGED)
            z = depth_img[coord[:, 0], coord[:, 1]] / 1000.0
            x = (coord[:, 1] + 0.5 - self.K[0, 2]) * z / self.K[0, 0]
            y = (coord[:, 0] + 0.5 - self.K[1, 2]) * z / self.K[1, 1]
            depth = np.sqrt(x * x + y * y + z * z).astype(np.float32)
        else:
            depth = np.zeros(occupancy.shape, np.float32)

        item = {
            "data_idx": data_idx,
            "view_idx": view_idx,
            "rgb": rays["rgb"],
            "depth": depth,
            "body_mask": rays["body_mask"],
            "occupancy": occupancy.astype(np.float32),
            "ray_o": rays["ray_o"],
            "ray_d": rays["ray_d"],
            "near": rays["near"],
            "far": rays["far"],
            "w2c_RT": w2c_RT,
        }
        if light:
            item["pose_idx"] = pose_idx
        else:
            item.update({
                "smpl_pose": live_pose,
                "smpl_pos_map": smpl_pos_map,             # (H, W, 6) HWC
                "cano2live_jnt_mats": cano2live.astype(np.float32),
                "cano2posmap_jnt_mats": self.cano2posmap_jnt_mats,
                "cano_bounds": self.cano_bounds,
                "cano_smpl_center": self.cano_smpl_center.astype(np.float32),
                "cano_smpl_jnts": self.cano_smpl_jnts,
                "live_smpl_v": live_v.astype(np.float32),
            })

        if self.training:
            pre = self.presampled_data[pose_idx]
            # clamp to the presampled population (tiny synthetic subjects)
            n_sur = min(SURFACE_PTS_PER_ITEM, pre["sur_pts"].shape[0])
            n_vol = min(VOLUME_PTS_PER_ITEM, pre["vol_pts"].shape[0])
            sid = rng.choice(pre["sur_pts"].shape[0], n_sur, replace=False)
            vid = rng.choice(pre["vol_pts"].shape[0], n_vol, replace=False)
            item["cano_pts"] = np.concatenate(
                [pre["sur_pts"][sid], pre["vol_pts"][vid]]).astype(np.float32)
            item["cano_pts_ov"] = np.concatenate(
                [pre["sur_pts_ov"][sid],
                 pre["vol_pts_ov"][vid]]).astype(np.float32)
        else:
            item["cano_pts"] = self.infer_pts
            item["valid_pts_flag"] = self.infer_pts_flag

        return item

    def batches(self, batch_size: int, shuffle: bool = True,
                seed: int = 31359, drop_last: bool = True,
                num_workers: int = 0, prefetch_batches: int = 2,
                light: bool = False, workers: str = "thread"):
        """Epoch iterator yielding stacked numpy batches (torch DataLoader
        equivalent, reference :349-359).

        num_workers > 0 decodes items on a worker pool and keeps
        ``prefetch_batches`` batches in flight, overlapping imread/ray
        sampling with the device step like the reference's worker loader
        (reference dataset/avatarcap_dataset.py:349-359). Each item then
        draws from its own position-seeded RandomState so the sample
        stream is deterministic regardless of worker timing (the serial
        num_workers=0 path keeps the legacy shared-rng stream).

        workers: 'thread' (default) or 'process'. The thread pool is
        GIL-bound — measured 6.99 -> 3.27 steps/s when the host runs
        other work concurrently (PERFORMANCE.md r4) — while 'process'
        forks workers that inherit the dataset read-only (no pickling of
        self; items return via pickle, ~100 KB each on the light path)
        and keep full decode throughput under host contention. Both
        yield IDENTICAL batches for the same seed.
        """
        rng = np.random.RandomState(seed)
        order = np.arange(len(self))
        if shuffle:
            rng.shuffle(order)
        n = len(order) // batch_size if drop_last else \
            -(-len(order) // batch_size)

        if num_workers <= 0:
            for b in range(n):
                idxs = order[b * batch_size:(b + 1) * batch_size]
                items = [self.__getitem__(int(i), rng, light=light)
                         for i in idxs]
                yield {k: np.stack([it[k] for it in items])
                       for k in items[0]}
            return

        from collections import deque

        def item_seed(pos: int) -> int:
            return (seed + 1000003 * (pos + 1)) % (2 ** 31 - 1)

        if workers == "process":
            # cached across epochs (fork cost ~1 s); never shut down here
            ex, get_fn = self._fork_pool(num_workers)
            own_pool = False
        else:
            from concurrent.futures import ThreadPoolExecutor
            ex = ThreadPoolExecutor(max_workers=num_workers)
            own_pool = True

            def get_fn(i, s, lt):
                return self.__getitem__(i, np.random.RandomState(s), lt)

        try:
            pending = deque()

            def submit(b: int) -> None:
                idxs = order[b * batch_size:(b + 1) * batch_size]
                pending.append([
                    ex.submit(get_fn, int(i),
                              item_seed(b * batch_size + j), light)
                    for j, i in enumerate(idxs)])

            nxt = 0
            for _ in range(min(prefetch_batches + 1, n)):
                submit(nxt)
                nxt += 1
            while pending:
                futs = pending.popleft()
                items = [f.result() for f in futs]
                if nxt < n:
                    submit(nxt)
                    nxt += 1
                yield {k: np.stack([it[k] for it in items])
                       for k in items[0]}
        finally:
            if own_pool:
                ex.shutdown(wait=False, cancel_futures=True)

    def _fork_pool(self, num_workers: int):
        """Process pool whose forked children inherit this dataset via a
        module global — submitting a bound method would pickle SELF
        (pos maps + presampled points, 100s of MB) per task. Fork is
        safe here because __getitem__ is jax-free by contract (numpy +
        cv2 only) and children never touch the TPU client.

        The pool is CACHED on the dataset and reused across epochs:
        forking a JAX-initialized multi-GB parent costs ~1 s, which
        dominated short epochs when paid per `batches()` call."""
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor
        pool = getattr(self, "_proc_pool", None)
        if pool is None or pool[1] != num_workers:
            if pool is not None:
                pool[0].shutdown(wait=False, cancel_futures=True)
            global _FORK_DATASET
            _FORK_DATASET = self
            ex = ProcessPoolExecutor(max_workers=num_workers,
                                     mp_context=mp.get_context("fork"))
            self._proc_pool = pool = (ex, num_workers)
        return pool[0], _fork_getitem

    def device_batches(self, batch_size: int, shuffle: bool = True,
                       seed: int = 31359, drop_last: bool = True,
                       num_workers: int = 0, prefetch_batches: int = 2,
                       workers: str = "thread"):
        """Training batches as DEVICE arrays, tunnel-bandwidth-aware.

        The thread-pool loader overlaps decode with the step, but on the
        tunneled TPU the real training bottleneck is the host->device
        COPY (~25 MB/s): a naive batch ships ~7 MB — 6.3 MB of it the
        smpl_pos_map, live SMPL vertices and joint mats, which are
        PER-POSE CONSTANTS re-uploaded every batch (measured 2.6 steps/s
        vs 7.5 device-only, VERDICT r3 weak #5). Here those constants
        live on device once (one upload per epoch 0) and each batch
        gathers them by pose index ON DEVICE; only the per-view arrays
        (rays, sampled points — ~1.4 MB) ship per batch, and the NEXT
        batch's upload is issued asynchronously before the current one
        is consumed, so the remaining copy rides under the device step.

        Yields the same keys as ``batches`` (training mode), as jax
        arrays.
        """
        import jax
        import jax as _jax  # noqa: F401 (device_put is the whole point)

        assert self.training, "device_batches is a training-path helper"
        if not hasattr(self, "_dev_pose_cache"):
            P = len(self.smpl_pose_list)
            entries = [self._live_fk(i) for i in range(P)]
            self._dev_pose_cache = {
                "smpl_pos_map": jnp.asarray(np.stack(self.pos_maps)),
                "smpl_pose": jnp.asarray(np.stack([e[0] for e in entries])),
                "live_smpl_v": jnp.asarray(
                    np.stack([e[1] for e in entries])),
                "cano2live_jnt_mats": jnp.asarray(
                    np.stack([e[2] for e in entries])),
                "cano2posmap_jnt_mats": jnp.asarray(
                    self.cano2posmap_jnt_mats),
                "cano_bounds": jnp.asarray(self.cano_bounds),
                "cano_smpl_center": jnp.asarray(
                    self.cano_smpl_center.astype(np.float32)),
                "cano_smpl_jnts": jnp.asarray(self.cano_smpl_jnts),
            }

            @jax.jit
            def assemble(small, pose_ids):
                c = self._dev_pose_cache
                B = pose_ids.shape[0]
                out = dict(small)
                for k in ("smpl_pos_map", "smpl_pose", "live_smpl_v",
                          "cano2live_jnt_mats"):
                    out[k] = c[k][pose_ids]
                for k in ("cano2posmap_jnt_mats", "cano_bounds",
                          "cano_smpl_center", "cano_smpl_jnts"):
                    out[k] = jnp.broadcast_to(c[k][None],
                                              (B,) + c[k].shape)
                return out

            self._dev_assemble = assemble

        def upload(batch):
            pose_ids = jnp.asarray(batch.pop("pose_idx"))
            small = {k: jax.device_put(v) for k, v in batch.items()
                     if isinstance(v, np.ndarray)
                     and v.dtype != np.object_}
            # async: device_put/jit dispatch return immediately; the
            # copy streams while the previous step runs
            return self._dev_assemble(small, pose_ids)

        prev = None
        for batch in self.batches(batch_size, shuffle=shuffle, seed=seed,
                                  drop_last=drop_last,
                                  num_workers=num_workers,
                                  prefetch_batches=prefetch_batches,
                                  light=True, workers=workers):
            dev = upload(batch)
            if prev is not None:
                yield prev
            prev = dev
        if prev is not None:
            yield prev
