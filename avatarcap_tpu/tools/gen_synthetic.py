"""Synthetic subject generation (dataset-layout writer).

Produces the on-disk training/testing layout the dataset expects
(reference gen_data/preprocess_training_data.py outputs: dataConfig.yaml,
smpl/pose_*.txt + shape.txt, smpl_pos_map_*.exr, cano_pts_ov/*.npz, orbit
imgs + cams.mat, cano_base_blend_weight_volume.npy) from a body model and
poses — using the device renderer instead of OpenGL. With a toy body model
this doubles as the integration-test fixture; with real SMPL + scans the
full preprocessing lives in avatarcap_tpu.tools.preprocess.
"""

from __future__ import annotations

import math
import os

os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")

import cv2 as cv  # noqa: E402
import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import yaml  # noqa: E402

from avatarcap_tpu.body.smpl import (  # noqa: E402
    SmplParams, smpl_forward, canonical_pose)
from avatarcap_tpu.ops.knn import knn, approx_lbs_weights  # noqa: E402
from avatarcap_tpu.ops.inside import points_inside_mesh  # noqa: E402
from avatarcap_tpu.ops.se3 import axis_angle_to_matrix  # noqa: E402
from avatarcap_tpu.render.camera import (  # noqa: E402
    cano_front_back_mvp, gl_perspective_projection_matrix)
from avatarcap_tpu.render.visualize import (  # noqa: E402
    render_cano_mesh, render_mesh_single)
from avatarcap_tpu.data.image_io import save_float_image  # noqa: E402


def render_smpl_position_map(smpl_params: SmplParams, pose: np.ndarray,
                             shape: np.ndarray, res: int = 256,
                             window: int = 8) -> np.ndarray:
    """SMPL position map: canonical geometry rendered with *posed*
    (root-centered, zero-global, zero-hand) vertex positions as attributes,
    front|back side by side (reference gen_data/preprocess_training_data.py:
    382-423)."""
    cano = smpl_forward(smpl_params, jnp.asarray(canonical_pose()),
                        jnp.asarray(shape))
    cano_v = np.asarray(cano.vertices)
    center = 0.5 * (cano_v.max(0) + cano_v.min(0))

    pose_ = pose.copy()
    pose_[:6] = 0.0
    pose_[3 + 22 * 3: 6 + 22 * 3] = 0.0
    pose_[3 + 23 * 3: 6 + 23 * 3] = 0.0
    posed = smpl_forward(smpl_params, jnp.asarray(pose_), jnp.asarray(shape))
    posed_v = np.asarray(posed.vertices) - np.asarray(posed.joints)[0]

    faces = smpl_params.faces
    tris = jnp.asarray(cano_v[faces])
    attr = jnp.asarray(posed_v[faces])
    valid = jnp.ones((faces.shape[0],), bool)
    fmvp, fmv, bmvp, bmv = cano_front_back_mvp(center.astype(np.float32))
    front, back = render_cano_mesh(tris, attr, valid, jnp.asarray(fmvp),
                                   jnp.asarray(fmv), jnp.asarray(bmvp),
                                   jnp.asarray(bmv), res=res, window=window)
    return np.concatenate([np.asarray(front), np.asarray(back)], axis=1)


def compute_weight_volume(smpl_params: SmplParams, shape: np.ndarray,
                          voxel: float = 0.025, max_dist: float = 0.08):
    """Canonical LBS weight volume on the reference's arange grid
    (reference gen_data/preprocess_training_data.py:426-463). Weights come
    from Gaussian-KNN against the canonical surface (the reference uses
    closest-triangle barycentric; both vanish beyond 8 cm and agree to the
    LBS smoothness scale)."""
    cano = smpl_forward(smpl_params, jnp.asarray(canonical_pose()),
                        jnp.asarray(shape))
    v = np.asarray(cano.vertices)
    min_xyz = v.min(0)
    max_xyz = v.max(0)
    min_xyz[:2] -= 0.05
    max_xyz[:2] += 0.05
    min_xyz[2] -= 0.15
    max_xyz[2] += 0.15
    xs = np.arange(min_xyz[0], max_xyz[0] + voxel, voxel)
    ys = np.arange(min_xyz[1], max_xyz[1] + voxel, voxel)
    zs = np.arange(min_xyz[2], max_xyz[2] + voxel, voxel)
    pts = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"),
                   axis=-1).astype(np.float32)
    X, Y, Z, _ = pts.shape
    flat = pts.reshape(-1, 3)
    w = np.array(approx_lbs_weights(jnp.asarray(flat), cano.vertices,
                                    jnp.asarray(smpl_params.weights)))
    d2, _ = knn(jnp.asarray(flat), cano.vertices, k=1)
    w[np.asarray(d2[:, 0]) > max_dist ** 2] = 0.0
    return w.reshape(X, Y, Z, -1).astype(np.float32)


def orbit_extrinsics(center: np.ndarray, view_idx: int, n_views: int,
                     dist: float = 2.3) -> np.ndarray:
    """Orbit-view extrinsic: trans_center -> rot_y -> rot_x(pi) -> trans_z
    (reference gen_data/preprocess_training_data.py:327-351)."""
    ang = 2 * math.pi * view_idx / n_views
    rot_y = np.eye(4, dtype=np.float32)
    rot_y[:3, :3] = np.asarray(axis_angle_to_matrix(
        jnp.asarray([0.0, ang, 0.0])))
    rot_x = np.eye(4, dtype=np.float32)
    rot_x[:3, :3] = np.asarray(axis_angle_to_matrix(
        jnp.asarray([math.pi, 0.0, 0.0])))
    tc = np.eye(4, dtype=np.float32)
    tc[:3, 3] = -np.asarray(center, np.float32)
    tz = np.eye(4, dtype=np.float32)
    tz[2, 3] = dist
    return tz @ rot_x @ rot_y @ tc


def render_textured_orbit_views(verts: np.ndarray, faces: np.ndarray,
                                colors: np.ndarray, img_dir: str,
                                cam: dict, n_views: int = 60,
                                dist: float = 2.3, window: int = 8):
    """Orbit color/depth/mask views of a TEXTURED scan + cams.mat
    (reference gen_data/preprocess_training_data.py:314-379).

    These JPEGs are the avatar's entire RGB/NeRF supervision for real
    scan subjects; the color pass interpolates raw vertex colors (the
    reference's 'vertex_attribute' GLSL program), the position pass gives
    the mask and camera-space depth in millimeter uint16.

    Args:
      verts: (V, 3) scan vertices (live space, like the reference).
      faces: (F, 3) int.
      colors: (V, 3) float RGB in [0, 1] (uint8 inputs are rescaled).
    """
    import scipy.io as sio

    os.makedirs(img_dir, exist_ok=True)
    colors = np.asarray(colors, np.float32)
    if colors.max() > 1.1:  # uint8-style colors (reference :336-338)
        colors = colors / 255.0
    img_w, img_h = int(cam["img_width"]), int(cam["img_height"])
    proj = gl_perspective_projection_matrix(
        cam["fx"], cam["fy"], cam["cx"], cam["cy"], img_w, img_h)
    center = 0.5 * (verts.max(0) + verts.min(0))
    tris = jnp.asarray(verts[faces])
    color_tris = jnp.asarray(colors[faces])
    valid = jnp.ones((len(faces),), bool)

    cam_rs, cam_ts = [], []
    for view_idx in range(n_views):
        extr = orbit_extrinsics(center, view_idx, n_views, dist)
        mvp = jnp.asarray(proj @ extr)
        # color: interpolated vertex colors, black background
        out = render_mesh_single(tris, color_tris, valid, mvp,
                                 jnp.asarray(extr), img_h, img_w,
                                 window=window)
        img = np.where(np.asarray(out.mask)[..., None],
                       np.asarray(out.attrs), 0.0)
        cv.imwrite(os.path.join(img_dir, f"color_view_{view_idx:03d}.jpg"),
                   (255 * np.clip(img[..., ::-1], 0, 1)).astype(np.uint8))
        # mask + camera-space depth from the position pass (reference
        # :362-370: model-space positions -> extr -> z in mm)
        pos = render_mesh_single(tris, tris, valid, mvp,
                                 jnp.asarray(extr), img_h, img_w,
                                 window=window)
        mask = np.asarray(pos.mask)
        cv.imwrite(os.path.join(img_dir, f"mask_view_{view_idx:03d}.png"),
                   (255 * mask).astype(np.uint8))
        world = np.asarray(pos.attrs)
        camz = (world @ extr[:3, :3].T + extr[:3, 3])[..., 2]
        camz = np.where(mask, camz, 0.0)
        cv.imwrite(os.path.join(img_dir, f"depth_view_{view_idx:03d}.png"),
                   (1000 * camz).astype(np.uint16))
        cam_rs.append(cv.Rodrigues(extr[:3, :3])[0][:, 0])
        cam_ts.append(extr[:3, 3])
    sio.savemat(os.path.join(img_dir, "cams.mat"),
                {"cam_rs": np.stack(cam_rs), "cam_ts": np.stack(cam_ts)})


def generate_subject(out_dir: str, smpl_params: SmplParams,
                     shape: np.ndarray, poses: np.ndarray,
                     n_views: int = 4, img_size: int = 128,
                     pos_map_res: int = 64,
                     sur_pts_count: int = 20000, vol_pts_count: int = 2000,
                     seed: int = 0):
    """Write a full synthetic training subject.

    The "scan" for each pose is the posed body mesh itself; SDF labels are
    signed point-to-surface distances (sign from ray-parity inside test) —
    the reference's igl exact SDF, approximated by dense surface sampling.
    """
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(out_dir, "smpl"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "cano_pts_ov"), exist_ok=True)

    np.savetxt(os.path.join(out_dir, "smpl/shape.txt"), shape)

    cam = {"fx": float(5 * img_size), "fy": float(5 * img_size),
           "cx": img_size / 2.0, "cy": img_size / 2.0,
           "img_width": img_size, "img_height": img_size}
    with open(os.path.join(out_dir, "dataConfig.yaml"), "w") as f:
        yaml.safe_dump({"data_type": "synthetic", "camera": cam,
                        "pos_map_name": "cano",
                        "pos_map_res": pos_map_res}, f)

    cano = smpl_forward(smpl_params, jnp.asarray(canonical_pose()),
                        jnp.asarray(shape))
    cano_v = np.asarray(cano.vertices)
    faces = smpl_params.faces
    inv_cano = np.linalg.inv(np.asarray(cano.jnt_affine_mats))

    # dense canonical surface samples for SDF labels
    tri_v = cano_v[faces]                                  # (F, 3, 3)
    areas = 0.5 * np.linalg.norm(
        np.cross(tri_v[:, 1] - tri_v[:, 0], tri_v[:, 2] - tri_v[:, 0]), axis=-1)
    probs = areas / areas.sum()

    def sample_surface(n):
        fid = rng.choice(len(faces), n, p=probs)
        r1, r2 = rng.uniform(size=(2, n))
        s = np.sqrt(r1)
        bary = np.stack([1 - s, s * (1 - r2), s * r2], axis=-1)
        return (tri_v[fid] * bary[..., None]).sum(1).astype(np.float32)

    dense = sample_surface(100000)

    def signed_distance(pts):
        d2, _ = knn(jnp.asarray(pts), jnp.asarray(dense), k=1)
        d = np.sqrt(np.asarray(d2[:, 0]))
        inside = np.asarray(points_inside_mesh(jnp.asarray(pts),
                                               jnp.asarray(tri_v)))
        return np.where(inside, d, -d)  # inside-positive (reference :306)

    for i, pose in enumerate(poses):
        np.savetxt(os.path.join(out_dir, f"smpl/pose_{i:04d}.txt"), pose)

        # pos map EXR: front|back side by side at 2*res x res? reference
        # stores (res, 2*res) then the dataset resizes; we store at
        # 2*pos_map_res wide like the reference 256x512
        pm = render_smpl_position_map(smpl_params, pose, shape,
                                      res=pos_map_res)
        save_float_image(os.path.join(
            out_dir, f"smpl/smpl_pos_map_{i:04d}_cano"), pm)

        # presampled canonical points + SDF labels (reference :252-311)
        sur = sample_surface(sur_pts_count)
        sur = sur + rng.standard_normal(sur.shape).astype(np.float32) * 0.02
        lo = cano_v.min(0) - 0.2
        hi = cano_v.max(0) + 0.2
        vol = (rng.uniform(size=(vol_pts_count, 3)) * (hi - lo)
               + lo).astype(np.float32)
        np.savez(os.path.join(out_dir, f"cano_pts_ov/{i:03d}.npz"),
                 sur_pts=sur, sur_pts_ov=signed_distance(sur),
                 vol_pts=vol, vol_pts_ov=signed_distance(vol))

        # orbit renders (reference :314-379)
        live = smpl_forward(smpl_params, jnp.asarray(pose.astype(np.float32)),
                            jnp.asarray(shape))
        live_v = np.asarray(live.vertices)
        img_dir = os.path.join(out_dir, f"imgs/{i:03d}")
        os.makedirs(img_dir, exist_ok=True)
        proj = gl_perspective_projection_matrix(
            cam["fx"], cam["fy"], cam["cx"], cam["cy"],
            img_size, img_size)
        center = 0.5 * (live_v.max(0) + live_v.min(0))
        cam_rs, cam_ts = [], []
        tris = jnp.asarray(live_v[faces])
        normals_live = _vertex_normal_tris(live_v, faces)
        for view_idx in range(n_views):
            ang = 2 * math.pi * view_idx / n_views
            rot_y = np.eye(4, dtype=np.float32)
            rot_y[:3, :3] = np.asarray(axis_angle_to_matrix(
                jnp.asarray([0.0, ang, 0.0])))
            rot_x = np.eye(4, dtype=np.float32)
            rot_x[:3, :3] = np.asarray(axis_angle_to_matrix(
                jnp.asarray([math.pi, 0.0, 0.0])))
            tc = np.eye(4, dtype=np.float32)
            tc[:3, 3] = -center
            tz = np.eye(4, dtype=np.float32)
            tz[2, 3] = 2.3
            extr = tz @ rot_x @ rot_y @ tc
            mvp = jnp.asarray(proj @ extr)
            out = render_mesh_single(tris, jnp.asarray(normals_live),
                                     jnp.ones((len(faces),), bool), mvp,
                                     jnp.asarray(extr), img_size, img_size,
                                     window=8, shading="phong")
            img = np.asarray(out.attrs)
            mask = np.asarray(out.mask)
            img = np.where(mask[..., None], img, 0.0)
            cv.imwrite(os.path.join(img_dir, f"color_view_{view_idx:03d}.jpg"),
                       (255 * img[..., ::-1]).astype(np.uint8))
            cv.imwrite(os.path.join(img_dir, f"mask_view_{view_idx:03d}.png"),
                       (255 * mask).astype(np.uint8))
            # depth: position pass -> camera z (reference :361-370)
            pos = render_mesh_single(tris, tris,
                                     jnp.ones((len(faces),), bool), mvp,
                                     jnp.asarray(extr), img_size, img_size,
                                     window=8)
            world = np.asarray(pos.attrs)
            camz = (world @ extr[:3, :3].T + extr[:3, 3])[..., 2]
            camz = np.where(np.asarray(pos.mask), camz, 0.0)
            cv.imwrite(os.path.join(img_dir, f"depth_view_{view_idx:03d}.png"),
                       (1000 * camz).astype(np.uint16))
            # camera-space normal map (the reference test data ships
            # normal_view EXRs consumed by the capture's fusion stage,
            # reference main.py:409-412); camera convention: y/z flipped
            # back at canonicalization (normal_fusion.py:57)
            nrm = render_mesh_single(tris, jnp.asarray(normals_live),
                                     jnp.ones((len(faces),), bool), mvp,
                                     jnp.asarray(extr), img_size, img_size,
                                     window=8)
            ncam = np.asarray(nrm.attrs) @ extr[:3, :3].T
            ncam[..., 1:] *= -1.0  # inverse of the y/z flip at consumption
            ncam = np.where(np.asarray(nrm.mask)[..., None], ncam, 0.0)
            save_float_image(os.path.join(
                img_dir, f"normal_view_{view_idx:03d}"),
                ncam.astype(np.float32))
            aa = cv.Rodrigues(extr[:3, :3])[0][:, 0]
            cam_rs.append(aa)
            cam_ts.append(extr[:3, 3])
        import scipy.io as sio
        sio.savemat(os.path.join(img_dir, "cams.mat"),
                    {"cam_rs": np.stack(cam_rs), "cam_ts": np.stack(cam_ts)})

    np.save(os.path.join(out_dir, "cano_base_blend_weight_volume.npy"),
            compute_weight_volume(smpl_params, shape))


def _vertex_normal_tris(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals, expanded to (F, 3, 3) soup attrs."""
    tri = verts[faces]
    fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    vn = np.zeros_like(verts)
    for k in range(3):
        np.add.at(vn, faces[:, k], fn)
    vn /= np.maximum(np.linalg.norm(vn, axis=-1, keepdims=True), 1e-12)
    return vn[faces].astype(np.float32)
