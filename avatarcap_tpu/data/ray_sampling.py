"""Host-side training ray sampling (numpy).

Exact port of the reference sampler (reference utils/nerf_util.py:102-182):
body-biased pixel sampling inside the projected bound mask, with ray/AABB
filtering, yielding exactly ``nrays`` rays — a static shape for jit.
This stays on the host (it is data-pipeline work interleaved with image
decoding), while the device-side equivalents live in avatarcap_tpu.ops.rays.
"""

from __future__ import annotations

import numpy as np
import cv2 as cv


def project(xyz, K, RT):
    xyz = np.dot(xyz, RT[:, :3].T) + RT[:, 3:].T
    xyz = np.dot(xyz, K.T)
    return xyz[:, :2] / xyz[:, 2:]


def get_rays_np(H, W, K, R, T):
    """reference utils/nerf_util.py:21-35."""
    rays_o = -np.dot(R.T, T).ravel()
    i, j = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32), indexing="xy")
    xy1 = np.stack([i, j, np.ones_like(i)], axis=2)
    pixel_camera = np.dot(xy1, np.linalg.inv(K).T)
    pixel_world = np.dot(pixel_camera - T.ravel(), R)
    rays_d = pixel_world - rays_o[None, None]
    rays_d = rays_d / np.linalg.norm(rays_d, axis=2, keepdims=True)
    rays_o = np.broadcast_to(rays_o, rays_d.shape)
    return rays_o, rays_d


def get_bound_2d_mask(bounds, K, pose, H, W):
    """reference utils/nerf_util.py:38-65."""
    min_x, min_y, min_z = bounds[0]
    max_x, max_y, max_z = bounds[1]
    corners_3d = np.array([
        [min_x, min_y, min_z], [min_x, min_y, max_z],
        [min_x, max_y, min_z], [min_x, max_y, max_z],
        [max_x, min_y, min_z], [max_x, min_y, max_z],
        [max_x, max_y, min_z], [max_x, max_y, max_z],
    ])
    corners_2d = np.round(project(corners_3d, K, pose)).astype(int)
    mask = np.zeros((H, W), dtype=np.uint8)
    for quad in ([0, 1, 3, 2, 0], [4, 5, 7, 6, 4], [0, 1, 5, 4, 0],
                 [2, 3, 7, 6, 2], [0, 2, 6, 4, 0], [1, 3, 7, 5, 1]):
        cv.fillPoly(mask, [corners_2d[quad]], 1)
    return mask


def get_near_far_np(bounds, ray_o, ray_d):
    """reference utils/nerf_util.py:68-99 (compacting host version)."""
    bounds = bounds + np.array([-0.01, 0.01])[:, None]
    nominator = bounds[None] - ray_o[:, None]
    d_intersect = (nominator / (ray_d[:, None] + 1e-9)).reshape(-1, 6)
    p_intersect = d_intersect[..., None] * ray_d[:, None] + ray_o[:, None]
    min_x, min_y, min_z, max_x, max_y, max_z = bounds.ravel()
    eps = 1e-6
    at_box = ((p_intersect[..., 0] >= min_x - eps) &
              (p_intersect[..., 0] <= max_x + eps) &
              (p_intersect[..., 1] >= min_y - eps) &
              (p_intersect[..., 1] <= max_y + eps) &
              (p_intersect[..., 2] >= min_z - eps) &
              (p_intersect[..., 2] <= max_z + eps))
    mask_at_box = at_box.sum(-1) == 2
    p_intervals = p_intersect[mask_at_box][at_box[mask_at_box]].reshape(
        -1, 2, 3)
    ray_o_m = ray_o[mask_at_box]
    ray_d_m = ray_d[mask_at_box]
    norm_ray = np.linalg.norm(ray_d_m, axis=1)
    d0 = np.linalg.norm(p_intervals[:, 0] - ray_o_m, axis=1) / norm_ray
    d1 = np.linalg.norm(p_intervals[:, 1] - ray_o_m, axis=1) / norm_ray
    return np.minimum(d0, d1), np.maximum(d0, d1), mask_at_box


def sample_rays(img, msk, K, R, T, bounds, nrays, training=True,
                body_sample_ratio=0.8, rng: np.random.RandomState = None):
    """reference utils/nerf_util.py:102-182 with an explicit RNG."""
    if rng is None:
        rng = np.random
    H, W = img.shape[:2]
    ray_o, ray_d = get_rays_np(H, W, K, R, T)
    pose = np.concatenate([R, T], axis=1)
    bound_mask = get_bound_2d_mask(bounds, K, pose, H, W)
    img = img.copy()
    img[bound_mask != 1] = 0
    msk = msk * bound_mask

    if training:
        nsampled = 0
        outs = {k: [] for k in ("ray_o", "ray_d", "rgb", "body_mask",
                                "near", "far", "coord")}
        while nsampled < nrays:
            n_body = int((nrays - nsampled) * body_sample_ratio)
            n_rand = (nrays - nsampled) - n_body
            coord_body = np.argwhere(msk > 0)
            coord_body = coord_body[rng.randint(0, len(coord_body), n_body)]
            coord = np.argwhere(bound_mask > 0)
            coord = coord[rng.randint(0, len(coord), n_rand)]
            coord = np.concatenate([coord_body, coord], axis=0)
            ro = ray_o[coord[:, 0], coord[:, 1]]
            rd = ray_d[coord[:, 0], coord[:, 1]]
            near, far, mab = get_near_far_np(bounds, ro, rd)
            outs["ray_o"].append(ro[mab])
            outs["ray_d"].append(rd[mab])
            outs["rgb"].append(img[coord[:, 0], coord[:, 1]][mab])
            outs["body_mask"].append(msk[coord[:, 0], coord[:, 1]][mab])
            outs["near"].append(near)
            outs["far"].append(far)
            outs["coord"].append(coord[mab])
            nsampled += len(near)
        return {
            "rgb": np.concatenate(outs["rgb"]).astype(np.float32),
            "body_mask": (np.concatenate(outs["body_mask"]) > 0)
            .astype(np.float32),
            "ray_o": np.concatenate(outs["ray_o"]).astype(np.float32),
            "ray_d": np.concatenate(outs["ray_d"]).astype(np.float32),
            "near": np.concatenate(outs["near"]).astype(np.float32),
            "far": np.concatenate(outs["far"]).astype(np.float32),
            "coord": np.concatenate(outs["coord"]),
        }
    # Test mode: full image, compacted. (The reference's test branch keeps
    # near/far at box-hit length while compacting rgb/rays to box&body —
    # a latent length mismatch in an unused path, utils/nerf_util.py:167-181;
    # we re-filter near/far consistently.)
    rgb = img.reshape(-1, 3).astype(np.float32)
    body_mask = msk.reshape(-1).astype(np.float32)
    ro = ray_o.reshape(-1, 3).astype(np.float32)
    rd = ray_d.reshape(-1, 3).astype(np.float32)
    near, far, box_mask = get_near_far_np(bounds, ro, rd)
    body_at_box = body_mask[box_mask] > 0
    final = np.logical_and(box_mask, body_mask > 0)
    return {
        "rgb": rgb[final],
        "body_mask": body_mask[final],
        "ray_o": ro[final],
        "ray_d": rd[final],
        "near": near[body_at_box].astype(np.float32),
        "far": far[body_at_box].astype(np.float32),
        "coord": np.argwhere(final.reshape(H, W)),
    }
