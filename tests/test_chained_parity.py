"""Chained whole-model parity vs the reference torch modules (VERDICT r1
missing item #3).

Round 1 tested each module in isolation; these tests chain the FULL
reference paths with random converted weights:

- OccupancyNet.query (reference network/arch_avatar.py:352-381):
  pose U-Net -> grid_sample feature fetch -> OffsetDecoder -> warp ->
  DoubleTNet geometry head.
- GeoTexAvatar.forward in posed space (reference :178-237): KNN inverse
  LBS -> weight-volume refinement -> warp -> template -> bounds/near
  masking -> raw2alpha.
- ReconNetwork.infer (reference network/arch_recon.py:45-76): HGFilter ->
  pixel-aligned fetch -> decoder MLP.

The reference file imports pytorch3d and eagerly loads the licensed SMPL
pkl; neither exists here, so both are stubbed before import: knn_points /
knn_gather get exact torch.cdist+topk implementations (pytorch3d returns
SQUARED distances), and dataset.smpl gets the toy body's weights. The
stubs feed the same math the CUDA kernels would.
"""

import os
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

from conftest import make_toy_smpl_params  # noqa: E402


def _install_reference_stubs(weights: np.ndarray):
    """Stub pytorch3d + dataset.smpl so network.arch_avatar imports."""
    if "pytorch3d" not in sys.modules:
        p3d = types.ModuleType("pytorch3d")
        ops = types.ModuleType("pytorch3d.ops")

        def knn_points(p1, p2, K=1, **kw):
            # pytorch3d semantics: SQUARED L2, ascending
            d2 = torch.cdist(p1, p2) ** 2          # (B, N, V)
            dists, idx = torch.topk(d2, K, dim=-1, largest=False)
            return dists, idx, None

        def knn_gather(x, idx):
            # x (B, V, C), idx (B, N, K) -> (B, N, K, C)
            B, N, K = idx.shape
            flat = idx.reshape(B, N * K)
            out = torch.gather(
                x, 1, flat[..., None].expand(-1, -1, x.shape[-1]))
            return out.reshape(B, N, K, x.shape[-1])

        ops.knn_points = knn_points
        ops.knn_gather = knn_gather
        p3d.ops = ops
        sys.modules["pytorch3d"] = p3d
        sys.modules["pytorch3d.ops"] = ops

    if "dataset.smpl" not in sys.modules:
        dsmod = types.ModuleType("dataset")
        smplmod = types.ModuleType("dataset.smpl")
        fake = types.SimpleNamespace(weights=weights)
        smplmod.smpl_params = fake
        dsmod.smpl = smplmod
        sys.modules["dataset"] = dsmod
        sys.modules["dataset.smpl"] = smplmod


@pytest.fixture(scope="module")
def ref_env(tmp_path_factory):
    """Reference GeoTexAvatar (torch, random weights) + converted vars +
    shared toy statics."""
    params = make_toy_smpl_params()
    _install_reference_stubs(params.weights)

    import config as ref_config
    ref_config.device = torch.device("cpu")

    tmp = tmp_path_factory.mktemp("wvol")
    rs = np.random.RandomState(7)
    # a smooth random 24-ch weight volume, normalized like the real one
    wv = rs.rand(12, 14, 10, params.weights.shape[1]).astype(np.float32)
    wv /= wv.sum(-1, keepdims=True)
    np.save(tmp / "cano_base_blend_weight_volume.npy", wv)
    ref_config.cfg.update({
        "model": {"warping_field": {"pos_encoding": 0},
                  "cano_template": {"pos_encoding": 10}},
        "training": {"training_data_dir": str(tmp)},
    })

    torch.manual_seed(31359)
    np.random.seed(31359)
    from network.arch_avatar import GeoTexAvatar as TorchAvatar
    from network.arch_avatar import OccupancyNet as TorchOccNet
    tm = TorchAvatar()
    # realistic BN running stats, then freeze
    with torch.no_grad():
        for _ in range(2):
            tm.warping_field.unet.train()(torch.randn(2, 6, 128, 128))
        tm.eval()

    from avatarcap_tpu.models.avatar import GeoTexAvatar
    from avatarcap_tpu.tools.convert_torch_ckpt import convert_geotex_avatar
    from avatarcap_tpu.pipeline.avatar import AvatarStatics

    variables = convert_geotex_avatar(tm.state_dict())
    module = GeoTexAvatar(if_type="sdf")

    from avatarcap_tpu.body.smpl import smpl_forward, canonical_pose
    cano = smpl_forward(params, jnp.asarray(canonical_pose()),
                        jnp.asarray(np.zeros(10, np.float32)))
    v = np.asarray(cano.vertices)
    lo = v.min(0) - np.array([0.05, 0.05, 0.15], np.float32)
    hi = v.max(0) + np.array([0.05, 0.05, 0.15], np.float32)
    statics = AvatarStatics(
        weight_volume=jnp.asarray(wv),
        cano_smpl_vertices=cano.vertices,
        smpl_skinning_weights=jnp.asarray(params.weights),
        cano_bounds=jnp.asarray(np.stack([lo, hi])),
        cano_smpl_center=jnp.asarray(0.5 * (lo + hi)))
    return {"tm": tm, "TorchOccNet": TorchOccNet, "module": module,
            "variables": variables, "statics": statics, "params": params,
            "cano_v": v}


def _torch_batch(statics, pos_map_nchw, cano_v, params,
                 cano2live=None):
    lo = np.asarray(statics.cano_bounds[0])
    hi = np.asarray(statics.cano_bounds[1])
    center = np.asarray(statics.cano_smpl_center)
    batch = {
        "smpl_pos_map": torch.from_numpy(pos_map_nchw),
        "cano_smpl_center": torch.from_numpy(center[None]),
        "cano_bounds": torch.from_numpy(np.stack([lo, hi])[None]),
        "live_smpl_v": torch.from_numpy(cano_v[None]),
    }
    if cano2live is not None:
        batch["cano2live_jnt_mats"] = torch.from_numpy(cano2live[None])
    return batch


class TestChainedOccupancyNet:
    def test_full_chain(self, ref_env):
        """U-Net -> pose-feature fetch -> OffsetDecoder -> warp ->
        DoubleTNet vs compute_pose_features + query_occupancy."""
        e = ref_env
        rs = np.random.RandomState(3)
        pos_map = rs.standard_normal((1, 6, 256, 256)).astype(np.float32)
        center = np.asarray(e["statics"].cano_smpl_center)
        pts = (center + rs.uniform(-0.4, 0.4, (1, 4096, 3))
               ).astype(np.float32)

        batch = _torch_batch(e["statics"], pos_map, e["cano_v"], e["params"])
        batch["cano_pts"] = torch.from_numpy(pts)
        occ_net = e["TorchOccNet"](e["tm"])
        with torch.no_grad():
            e["tm"].warping_field.precompute_conv(batch)
            ref = occ_net.query(batch)

        from avatarcap_tpu.pipeline.avatar import (compute_pose_features,
                                                   query_occupancy)
        feat, _ = compute_pose_features(e["module"], e["variables"],
                                        jnp.asarray(np.moveaxis(
                                            pos_map, 1, -1)))
        out, _ = query_occupancy(e["module"], e["variables"],
                                 jnp.asarray(pts), feat, e["statics"])

        np.testing.assert_allclose(
            np.asarray(out["nonrigid_offset"]),
            ref["nonrigid_offset"].numpy(), atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(out["cano_pts_ov"]),
            ref["cano_pts_ov"].numpy(), atol=5e-4)

    def test_fused_kernel_chain(self, ref_env):
        """The Pallas-packed fused path (XLA fallback on CPU) against the
        same torch oracle."""
        e = ref_env
        rs = np.random.RandomState(4)
        pos_map = rs.standard_normal((1, 6, 256, 256)).astype(np.float32)
        center = np.asarray(e["statics"].cano_smpl_center)
        pts = (center + rs.uniform(-0.4, 0.4, (1, 2048, 3))
               ).astype(np.float32)

        batch = _torch_batch(e["statics"], pos_map, e["cano_v"], e["params"])
        batch["cano_pts"] = torch.from_numpy(pts)
        occ_net = e["TorchOccNet"](e["tm"])
        with torch.no_grad():
            e["tm"].warping_field.precompute_conv(batch)
            ref = occ_net.query(batch)

        from jax.experimental.pallas import tpu as pltpu
        from avatarcap_tpu.pipeline.avatar import (
            compute_pose_features, pack_fused_query_weights,
            query_occupancy_fused)
        feat, _ = compute_pose_features(e["module"], e["variables"],
                                        jnp.asarray(np.moveaxis(
                                            pos_map, 1, -1)))
        packed = pack_fused_query_weights(e["variables"])
        with pltpu.force_tpu_interpret_mode():
            out = query_occupancy_fused(packed, jnp.asarray(pts), feat,
                                        e["statics"])
        # the fused kernel computes in bf16 (production MXU precision);
        # the f32 chain above already pins exact semantics at 5e-4
        np.testing.assert_allclose(
            np.asarray(out["cano_pts_ov"]),
            ref["cano_pts_ov"].numpy(), atol=2e-2)


class TestChainedAvatarForward:
    def test_posed_space_forward(self, ref_env):
        """Full posed-space query: KNN inverse LBS + weight-volume refine +
        warp + template + masking + raw2alpha (reference
        network/arch_avatar.py:178-237)."""
        e = ref_env
        from utils.smpl_util import smpl_util
        smpl_util.smpl_skinning_weights = torch.from_numpy(
            e["params"].weights)
        smpl_util.set_cano_smpl_vertices(torch.from_numpy(e["cano_v"]))

        rs = np.random.RandomState(5)
        J = e["params"].num_joints
        # a random small rigid motion per joint so live != cano
        cano2live = np.tile(np.eye(4, dtype=np.float32), (J, 1, 1))
        for j in range(J):
            aa = 0.1 * rs.standard_normal(3).astype(np.float32)
            t = 0.02 * rs.standard_normal(3).astype(np.float32)
            import cv2 as cv
            try:
                R = cv.Rodrigues(aa)[0].astype(np.float32)
            except Exception:
                from scipy.spatial.transform import Rotation
                R = Rotation.from_rotvec(aa).as_matrix().astype(np.float32)
            cano2live[j, :3, :3] = R
            cano2live[j, :3, 3] = t

        # live points: skinned cano verts + jitter (so they are near body)
        from avatarcap_tpu.body.skinning import skin_points
        live_v = np.asarray(skin_points(
            jnp.asarray(e["cano_v"]), jnp.asarray(e["params"].weights),
            jnp.asarray(cano2live)))
        sel = rs.choice(len(live_v), 1024)
        wpts = (live_v[sel] + 0.03 * rs.standard_normal((1024, 3))
                ).astype(np.float32)[None]
        dists = rs.uniform(0.001, 0.02, (1, 1024)).astype(np.float32)
        pos_map = rs.standard_normal((1, 6, 256, 256)).astype(np.float32)

        batch = _torch_batch(e["statics"], pos_map, live_v, e["params"],
                             cano2live=cano2live)
        with torch.no_grad():
            e["tm"].warping_field.precompute_conv(batch)
            # reference callers pass dists as (B, N, 1)
            # (arch_avatar.py:279: dists.view(n_batch, n*s, -1))
            ref = e["tm"].forward(torch.from_numpy(wpts), None,
                                  torch.from_numpy(dists[..., None]), batch,
                                  pts_space="posed")

        from avatarcap_tpu.pipeline.avatar import (
            FrameInputs, compute_pose_features, avatar_forward)
        frame = FrameInputs(
            live_smpl_v=jnp.asarray(live_v)[None],
            cano2live_jnt_mats=jnp.asarray(cano2live)[None],
            smpl_pos_map=jnp.asarray(np.moveaxis(pos_map, 1, -1)))
        feat, _ = compute_pose_features(e["module"], e["variables"],
                                        frame.smpl_pos_map)
        out, _ = avatar_forward(e["module"], e["variables"],
                                jnp.asarray(wpts), jnp.asarray(dists),
                                feat, frame, e["statics"],
                                pts_space="posed")

        # raw = [rgb, alpha]; occ; offsets. The KNN nearest neighbor can
        # legitimately tie-break differently at equidistant vertices, so
        # compare with a small mismatch allowance on masked alpha.
        ref_raw = ref["raw"].numpy()
        got_raw = np.asarray(out["raw"])
        close = np.isclose(got_raw, ref_raw, atol=1e-3)
        assert close.mean() > 0.999, f"raw mismatch {1 - close.mean():.2%}"
        np.testing.assert_allclose(np.asarray(out["occ"]),
                                   ref["occ"].numpy(), atol=5e-4)
        ref_off = ref["nonrigid_offset"].numpy()
        got_off = np.asarray(out["nonrigid_offset"])
        close = np.isclose(got_off, ref_off, atol=5e-4)
        assert close.mean() > 0.999, f"offset mismatch {1 - close.mean():.2%}"


class TestChainedReconInfer:
    def test_infer(self, ref_env):
        """HGFilter -> pixel-aligned fetch -> decoder MLP chained
        (reference network/arch_recon.py:45-76)."""
        e = ref_env
        torch.manual_seed(7)
        from network.arch_recon import ReconNetwork as TorchRecon
        from avatarcap_tpu.models.recon import ReconNetwork
        from avatarcap_tpu.tools.convert_torch_ckpt import \
            convert_recon_network

        tm = TorchRecon().eval()
        rs = np.random.RandomState(11)
        front = rs.standard_normal((1, 3, 128, 128)).astype(np.float32)
        back = rs.standard_normal((1, 3, 128, 128)).astype(np.float32)
        center = np.asarray(e["statics"].cano_smpl_center)
        pts = (center + rs.uniform(-0.4, 0.4, (1, 3000, 3))
               ).astype(np.float32)
        items = {
            "front_normal": torch.from_numpy(front),
            "back_normal": torch.from_numpy(back),
            "cano_pts": torch.from_numpy(pts),
            "cano_smpl_center": torch.from_numpy(center[None]),
        }
        with torch.no_grad():
            ref = tm.infer(items).numpy()

        recon = ReconNetwork()
        rvars = convert_recon_network(tm.state_dict())
        img = jnp.asarray(np.moveaxis(
            np.concatenate([front, back], axis=1), 1, -1))
        feat_map = recon.apply(rvars, img,
                               method=ReconNetwork.get_feat_maps)
        ov = recon.apply(rvars, feat_map, jnp.asarray(pts),
                         jnp.asarray(center[None]),
                         method=ReconNetwork.decode_points)
        # torch infer returns (1, N) channel-major after squeeze(0)
        np.testing.assert_allclose(np.asarray(ov)[0], ref[0], atol=2e-4)
