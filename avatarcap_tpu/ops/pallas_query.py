"""Fused Pallas point-query kernels (the Mpts/s hot path).

The implicit template evaluates millions of points per frame through
PE(10) -> 7-layer shared MLP (res concat @4) -> geo/color heads
(reference network/arch_avatar.py:26-83). Under plain XLA every layer
round-trips its (N, 256) activations through HBM (~34 GB at 2.1M points),
making the query bandwidth-bound at ~50-75 Mpts/s. This kernel keeps a
(256, TILE) activation panel resident in VMEM across ALL layers: HBM
traffic collapses to the points in + 8 output rows out, and the MXU runs
back-to-back bf16 matmuls.

Layout: channels-major (C, N). Points arrive as (3, N) tiles; weights are
pre-transposed (out, in) bf16 and live whole in VMEM (~1 MB). Used for
inference; training keeps the XLA path (autodiff through the flax module).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_FREQS = 10
PE_DIM = 3 * (1 + 2 * NUM_FREQS)  # 63


def _pe_rows(x):
    """(3, T) -> (63, T), reference channel order (x, sin f0 x, cos f0 x, ...)."""
    rows = [x]
    for k in range(NUM_FREQS):
        xf = x * (2.0 ** k)
        rows.append(jnp.sin(xf))
        rows.append(jnp.cos(xf))
    return jnp.concatenate(rows, axis=0)


def _dot(w_ref, h, b_ref):
    """(O, I) @ (I, T) + (O, 1), f32 accumulate.

    precision is pinned to DEFAULT: the operands are already bf16, and a
    global jax_default_matmul_precision="highest" (as the CPU test
    conftest sets) would otherwise reach Mosaic as contract_precision
    fp32 on bf16 vectors — a "Bad lhs type" TPU compile error.
    """
    return jnp.dot(w_ref[:], h, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.DEFAULT) + b_ref[:]


def _template_kernel(pts_ref,
                     w0, b0, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, w6, b6,
                     gw0, gb0, gw1, gb1,
                     cw0, cb0, cw1, cb1, cw2, cb2,
                     out_ref):
    x = pts_ref[:].astype(jnp.float32)           # (3, T)
    pe = _pe_rows(x).astype(jnp.bfloat16)        # (63, T)

    h = jax.nn.relu(_dot(w0, pe, b0)).astype(jnp.bfloat16)
    h = jax.nn.relu(_dot(w1, h, b1)).astype(jnp.bfloat16)
    h = jax.nn.relu(_dot(w2, h, b2)).astype(jnp.bfloat16)
    h = jax.nn.relu(_dot(w3, h, b3)).astype(jnp.bfloat16)
    h = jnp.concatenate([h, pe], axis=0)         # res concat @4 (319, T)
    h = jax.nn.relu(_dot(w4, h, b4)).astype(jnp.bfloat16)
    h = jax.nn.relu(_dot(w5, h, b5)).astype(jnp.bfloat16)
    feat = _dot(w6, h, b6).astype(jnp.bfloat16)  # final fc, no activation

    g = _dot(gw0, feat, gb0)
    g = jnp.where(g >= 0, g, 0.02 * g).astype(jnp.bfloat16)  # leaky 0.02
    geo = _dot(gw1, g, gb1)                      # (2, T) f32

    c = jax.nn.relu(_dot(cw0, feat, cb0)).astype(jnp.bfloat16)
    c = jax.nn.relu(_dot(cw1, c, cb1)).astype(jnp.bfloat16)
    rgb = jax.nn.sigmoid(_dot(cw2, c, cb2))      # (3, T) f32

    alpha = jax.nn.relu(geo[1:2])
    pad = jnp.zeros_like(rgb)
    out_ref[:] = jnp.concatenate(
        [geo[0:1], alpha, rgb, pad], axis=0)     # (8, T)


def pack_template_weights(template_params) -> Tuple[jnp.ndarray, ...]:
    """Flax DoubleTNet params -> pre-transposed bf16 kernel operands."""
    sp = template_params["shared_mlp"]
    gp = template_params["geo_mlp"]
    cp = template_params["clr_mlp"]

    def wt(p):
        return p["kernel"].T.astype(jnp.bfloat16)

    def bb(p):
        return p["bias"][:, None].astype(jnp.float32)

    ws = []
    for i in range(7):
        ws += [wt(sp[f"fc{i}"]), bb(sp[f"fc{i}"])]
    ws += [wt(gp["fc0"]), bb(gp["fc0"]),
           gp["fc1_kernel"].T.astype(jnp.bfloat16),
           gp["fc1_bias"][:, None].astype(jnp.float32)]
    for i in range(3):
        ws += [wt(cp[f"fc{i}"]), bb(cp[f"fc{i}"])]
    return tuple(ws)


# ---------------------------------------------------------------------------
# Warp field: OffsetDecoder (+ BN folded for eval) + offset head
# ---------------------------------------------------------------------------

def _softplus(x):
    return jnp.logaddexp(x, 0.0)


def _offset_kernel(feat_ref,
                   w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, w6, b6, w7, b7,
                   ow, ob, out_ref):
    x = feat_ref[:].astype(jnp.bfloat16)          # (67, T)
    h = _softplus(_dot(w1, x, b1)).astype(jnp.bfloat16)
    h = _softplus(_dot(w2, h, b2)).astype(jnp.bfloat16)
    h = _softplus(_dot(w3, h, b3)).astype(jnp.bfloat16)
    h = _softplus(_dot(w4, h, b4)).astype(jnp.bfloat16)
    h = jnp.concatenate([x, h], axis=0)           # skip concat @5 (323, T)
    h = _softplus(_dot(w5, h, b5)).astype(jnp.bfloat16)
    h = _softplus(_dot(w6, h, b6)).astype(jnp.bfloat16)
    h = _softplus(_dot(w7, h, b7)).astype(jnp.bfloat16)
    off = _dot(ow, h, ob)                         # (3, T) f32
    out_ref[:] = jnp.concatenate(
        [off, jnp.zeros((5, off.shape[1]), off.dtype)], axis=0)


def pack_offset_weights(warp_params, warp_stats, eps: float = 1e-5):
    """WarpingField mlp (OffsetDecoder) + out head -> kernel operands with
    eval BatchNorm folded into each layer's weight/bias."""
    mp = warp_params["mlp"]
    ms = warp_stats["mlp"]
    ws = []
    for i in range(1, 8):
        k = mp[f"conv{i}"]["kernel"].T            # (O, I)
        b = mp[f"conv{i}"]["bias"]
        scale = mp[f"bn{i}"]["scale"]
        bias = mp[f"bn{i}"]["bias"]
        mean = ms[f"bn{i}"]["mean"]
        var = ms[f"bn{i}"]["var"]
        a = scale / jnp.sqrt(var + eps)
        ws += [(k * a[:, None]).astype(jnp.bfloat16),
               ((b - mean) * a + bias)[:, None].astype(jnp.float32)]
    out = warp_params["out_layer_coord_affine"]
    ws += [out["kernel"].T.astype(jnp.bfloat16),
           out["bias"][:, None].astype(jnp.float32)]
    return tuple(ws)


@functools.partial(jax.jit, static_argnames=("tile",))
def offset_query_fused(packed_weights, feats: jnp.ndarray,
                       tile: int = 2048):
    """Fused warp-offset decode (eval only; BN uses running stats).

    Args:
      feats: (N, 67) = [pts_en(3), pose_feat(64)] per point.
    Returns:
      (N, 3) offsets.
    """
    N = feats.shape[0]
    pad = (-N) % tile
    fT = jnp.pad(feats, ((0, pad), (0, 0))).T     # (67, Np)
    npad = N + pad
    weight_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in packed_weights
    ]
    out = pl.pallas_call(
        _offset_kernel,
        grid=(npad // tile,),
        in_specs=[pl.BlockSpec((67, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)] + weight_specs,
        out_specs=pl.BlockSpec((8, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, npad), jnp.float32),
    )(fT, *packed_weights)
    return out[:3, :N].T


# ---------------------------------------------------------------------------
# ReconNet pixel-aligned decoder (weight-norm folded)
# ---------------------------------------------------------------------------

def _recon_kernel(feat_ref, w0, b0, w1, b1, w2, b2, w3, b3, out_ref):
    x = feat_ref[:].astype(jnp.bfloat16)               # (33, T)
    h = _dot(w0, x, b0)
    h = jnp.where(h >= 0, h, 0.02 * h).astype(jnp.bfloat16)
    h = jnp.concatenate([h, x], axis=0)                # res @1 (545, T)
    h = _dot(w1, h, b1)
    h = jnp.where(h >= 0, h, 0.02 * h).astype(jnp.bfloat16)
    h = jnp.concatenate([h, x], axis=0)                # res @2 (289, T)
    h = _dot(w2, h, b2)
    h = jnp.where(h >= 0, h, 0.02 * h).astype(jnp.bfloat16)
    occ = jax.nn.sigmoid(_dot(w3, h, b3))              # (1, T)
    out_ref[:] = jnp.concatenate(
        [occ, jnp.zeros((7, occ.shape[1]), occ.dtype)], axis=0)


def pack_recon_weights(decoder_params):
    """ReconNet image_decoder (weight_norm MLP) -> kernel operands.
    torch weight_norm folds to w = g * v / |v| per output channel."""
    ws = []
    for i in range(3):
        p = decoder_params[f"fc{i}"]
        v = p["v"]                                      # (I, O)
        g = p["g"]
        norm = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True))
        w = (v * (g[None, :] / jnp.maximum(norm, 1e-12))).T  # (O, I)
        ws += [w.astype(jnp.bfloat16),
               p["bias"][:, None].astype(jnp.float32)]
    p = decoder_params["fc3"]
    ws += [p["kernel"].T.astype(jnp.bfloat16),
           p["bias"][:, None].astype(jnp.float32)]
    return tuple(ws)


@functools.partial(jax.jit, static_argnames=("tile",))
def recon_decode_fused(packed_weights, feats: jnp.ndarray,
                       tile: int = 2048) -> jnp.ndarray:
    """Fused ReconNet pixel-aligned occupancy decode.

    Args:
      feats: (N, 33) = [pixel-aligned feature(32), z].
    Returns:
      (N,) occupancy in [0, 1].
    """
    N = feats.shape[0]
    pad = (-N) % tile
    fT = jnp.pad(feats, ((0, pad), (0, 0))).T           # (33, Np)
    npad = N + pad
    weight_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in packed_weights
    ]
    out = pl.pallas_call(
        _recon_kernel,
        grid=(npad // tile,),
        in_specs=[pl.BlockSpec((33, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)] + weight_specs,
        out_specs=pl.BlockSpec((8, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, npad), jnp.float32),
    )(fT, *packed_weights)
    return out[0, :N]


# ---------------------------------------------------------------------------
# Fully-fused query: warp offsets -> warped points -> template, one kernel
# ---------------------------------------------------------------------------

def _warp_template_core(pts, pf,
                        v1, c1, v2, c2, v3, c3, v4, c4, v5, c5, v6, c6,
                        v7, c7, ow, ob,
                        w0, b0, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5,
                        w6, b6, gw0, gb0, gw1, gb1,
                        cw0, cb0, cw1, cb1, cw2, cb2):
    """Warp-offset decode + DoubleTNet template on one (·, T) panel.

    pts: (3, T) f32 pre-warp canonical samples; pf: (64, T) bf16 pose
    features. Returns (geo (2, T) f32, rgb (3, T) f32, off (3, T) f32).
    Shared by the per-point and the per-ray kernels below.
    """
    x = jnp.concatenate([pts.astype(jnp.bfloat16), pf], axis=0)  # (67, T)
    h = _softplus(_dot(v1, x, c1)).astype(jnp.bfloat16)
    h = _softplus(_dot(v2, h, c2)).astype(jnp.bfloat16)
    h = _softplus(_dot(v3, h, c3)).astype(jnp.bfloat16)
    h = _softplus(_dot(v4, h, c4)).astype(jnp.bfloat16)
    h = jnp.concatenate([x, h], axis=0)
    h = _softplus(_dot(v5, h, c5)).astype(jnp.bfloat16)
    h = _softplus(_dot(v6, h, c6)).astype(jnp.bfloat16)
    h = _softplus(_dot(v7, h, c7)).astype(jnp.bfloat16)
    off = _dot(ow, h, ob)                         # (3, T) f32

    wpts = pts + off
    pe = _pe_rows(wpts).astype(jnp.bfloat16)
    h = jax.nn.relu(_dot(w0, pe, b0)).astype(jnp.bfloat16)
    h = jax.nn.relu(_dot(w1, h, b1)).astype(jnp.bfloat16)
    h = jax.nn.relu(_dot(w2, h, b2)).astype(jnp.bfloat16)
    h = jax.nn.relu(_dot(w3, h, b3)).astype(jnp.bfloat16)
    h = jnp.concatenate([h, pe], axis=0)
    h = jax.nn.relu(_dot(w4, h, b4)).astype(jnp.bfloat16)
    h = jax.nn.relu(_dot(w5, h, b5)).astype(jnp.bfloat16)
    feat = _dot(w6, h, b6).astype(jnp.bfloat16)

    g = _dot(gw0, feat, gb0)
    g = jnp.where(g >= 0, g, 0.02 * g).astype(jnp.bfloat16)
    geo = _dot(gw1, g, gb1)                       # (2, T)

    c = jax.nn.relu(_dot(cw0, feat, cb0)).astype(jnp.bfloat16)
    c = jax.nn.relu(_dot(cw1, c, cb1)).astype(jnp.bfloat16)
    rgb = jax.nn.sigmoid(_dot(cw2, c, cb2))       # (3, T)
    return geo, rgb, off


def _full_query_kernel(pts_ref, pf_ref,
                       # offset decoder (BN folded) + head
                       v1, c1, v2, c2, v3, c3, v4, c4, v5, c5, v6, c6, v7, c7,
                       ow, ob,
                       # template
                       w0, b0, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, w6, b6,
                       gw0, gb0, gw1, gb1,
                       cw0, cb0, cw1, cb1, cw2, cb2,
                       out_ref):
    pts = pts_ref[:].astype(jnp.float32)          # (3, T)
    geo, rgb, off = _warp_template_core(
        pts, pf_ref[:].astype(jnp.bfloat16),
        v1, c1, v2, c2, v3, c3, v4, c4, v5, c5, v6, c6, v7, c7, ow, ob,
        w0, b0, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, w6, b6,
        gw0, gb0, gw1, gb1, cw0, cb0, cw1, cb1, cw2, cb2)
    alpha = jax.nn.relu(geo[1:2])
    out_ref[:] = jnp.concatenate(
        [geo[0:1], alpha, rgb, off], axis=0)      # (8, T)


@functools.partial(jax.jit, static_argnames=("tile",))
def warp_template_query_fused(packed_offset, packed_template,
                              pts: jnp.ndarray, pose_feat: jnp.ndarray,
                              tile: int = 2048):
    """One-kernel warp+template query (inference).

    Args:
      pts: (N, 3) canonical points; pose_feat: (N, 64) sampled pose features.
    Returns:
      dict(occ (N, 1), alpha (N, 1), rgb (N, 3), offset (N, 3)).
    """
    N = pts.shape[0]
    pad = (-N) % tile
    ptsT = jnp.pad(pts, ((0, pad), (0, 0))).T          # (3, Np)
    pfT = jnp.pad(pose_feat.astype(jnp.bfloat16),
                  ((0, pad), (0, 0))).T                # (64, Np)
    npad = N + pad
    weights = tuple(packed_offset) + tuple(packed_template)
    weight_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in weights
    ]
    out = pl.pallas_call(
        _full_query_kernel,
        grid=(npad // tile,),
        in_specs=[pl.BlockSpec((3, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((64, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)] + weight_specs,
        out_specs=pl.BlockSpec((8, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, npad), jnp.float32),
    )(ptsT, pfT, *weights)
    out = out[:, :N]
    return {"occ": out[0:1].T, "alpha": out[1:2].T,
            "rgb": out[2:5].T, "offset": out[5:8].T}


# ---------------------------------------------------------------------------
# Per-RAY color integral: sample gen + feature lerp + warp+template MLP +
# alpha compositing, all inside one kernel invocation per ray tile.
# ---------------------------------------------------------------------------

def _ray_color_kernel(ro_ref, rd_ref, pf0_ref, pf1_ref, danch_ref,
                      bmin_ref, bmax_ref,
                      v1, c1, v2, c2, v3, c3, v4, c4, v5, c5, v6, c6, v7, c7,
                      ow, ob,
                      w0, b0, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, w6, b6,
                      gw0, gb0, gw1, gb1,
                      cw0, cb0, cw1, cb1, cw2, cb2,
                      out_ref, *, n_samples: int, near: float, far: float,
                      threshold: float, n_anchors: int):
    """One color ray per lane; the n_samples depth loop runs in VMEM.

    The chunked XLA path (pipeline/capture.py:_nerf_ray_colors_fused)
    materializes every (chunk*S, ·) sample tensor in HBM between the map
    body's fusions — ~4.6 GB/frame of pts/features/kernel-outputs at
    capture scale, measured as 2x the kernel's own time in pure
    dynamic-update-slice + data-formatting overhead. Here a ray tile
    loads (3+3)f32 + 2x64bf16 + A f32 per ray ONCE; each fori_loop step
    builds its sample positions ro + rd*z_s and the lerped pose features
    in registers, runs the same warp+template core as the per-point
    kernel, and folds the sample straight into the running transmittance
    (the reference's raw2outputs recurrence, volume_render.py): HBM
    traffic drops ~S-fold to the per-ray inputs + 3 output rows.

    Near-body masking uses the anchored-distance interpolation of
    CaptureOptions.near_flag_mode == 'ray' (capture.py:anchored_near_
    flags): the A exact per-anchor distances arrive per ray and each
    sample lerps the two bracketing anchors (uniform anchor grid ->
    scalar segment arithmetic, exactly searchsorted on a uniform grid).
    Bounds masking replicates the warped-point box test.
    """
    Tr_shape = ro_ref.shape[1]
    ro = ro_ref[:].astype(jnp.float32)            # (3, T)
    rd = rd_ref[:].astype(jnp.float32)            # (3, T)
    pf0 = pf0_ref[:].astype(jnp.bfloat16)         # (64, T)
    pf1 = pf1_ref[:].astype(jnp.bfloat16)
    danch = danch_ref[:].astype(jnp.float32)      # (A, T)
    bmin = bmin_ref[:].astype(jnp.float32)        # (3, 1)
    bmax = bmax_ref[:].astype(jnp.float32)
    gap = (far - near) / (n_samples - 1)

    def body(s, carry):
        trans, acc = carry
        s_f = s.astype(jnp.float32)
        z_s = near + gap * s_f
        w_s = s_f / (n_samples - 1)                # f32 scalar (Mosaic
        pts = ro + rd * z_s                        # has no bf16 SREG ops)
        pf = (pf0.astype(jnp.float32) * (1.0 - w_s)
              + pf1.astype(jnp.float32) * w_s).astype(jnp.bfloat16)
        geo, rgb, off = _warp_template_core(
            pts, pf,
            v1, c1, v2, c2, v3, c3, v4, c4, v5, c5, v6, c6, v7, c7,
            ow, ob,
            w0, b0, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, w6, b6,
            gw0, gb0, gw1, gb1, cw0, cb0, cw1, cb1, cw2, cb2)
        # anchored near flag: lerp the two bracketing anchor distances
        pos = s_f * ((n_anchors - 1) / (n_samples - 1))
        seg = jnp.minimum(jnp.floor(pos), n_anchors - 2.0)
        f = pos - seg
        d_s = jnp.zeros((1, Tr_shape), jnp.float32)
        for a in range(n_anchors):
            c_a = (jnp.where(seg == a, 1.0 - f, 0.0)
                   + jnp.where(seg == a - 1.0, f, 0.0))
            d_s = d_s + c_a * danch[a:a + 1]
        near_ok = d_s < threshold                  # (1, T)
        wpts = pts + off
        inside = jnp.all((wpts > bmin) & (wpts < bmax),
                         axis=0, keepdims=True)    # (1, T)
        sigma = jnp.where(inside & near_ok,
                          jax.nn.relu(geo[1:2]), 0.0)
        alpha = 1.0 - jnp.exp(-sigma * gap)        # (1, T)
        acc = acc + (alpha * trans) * rgb          # exclusive transmittance
        trans = trans * (1.0 - alpha + 1e-10)
        return trans, acc

    trans0 = jnp.ones((1, Tr_shape), jnp.float32)
    acc0 = jnp.zeros((3, Tr_shape), jnp.float32)
    trans, acc = jax.lax.fori_loop(0, n_samples, body, (trans0, acc0))
    out_ref[:] = jnp.concatenate(
        [acc, trans, jnp.zeros((4, Tr_shape), jnp.float32)], axis=0)


@functools.partial(jax.jit, static_argnames=(
    "tile", "n_samples", "near", "far", "threshold"))
def ray_color_query_fused(packed_offset, packed_template,
                          ro: jnp.ndarray, rd: jnp.ndarray,
                          pf0: jnp.ndarray, pf1: jnp.ndarray,
                          danch: jnp.ndarray, bounds: jnp.ndarray,
                          n_samples: int, near: float, far: float,
                          threshold: float = 0.08, tile: int = 2048):
    """Fused per-ray color integral (reference main.py:464-478 semantics
    via the raw2outputs recurrence of ops/volume_render.py).

    Args:
      ro, rd: (R, 3) ray origins / unit directions (canonical space).
      pf0, pf1: (R, 64) pose features sampled at the ray's near/far
        endpoints (depth-linear lerp between them per sample —
        CaptureOptions.nerf_feat_mode == 'lerp').
      danch: (R, A) exact distances to the body at A uniform depth
        anchors (near_flag_mode == 'ray' masking data).
      bounds: (2, 3) canonical bounds for the warped-point box mask.
      n_samples, near, far: STATIC sample grid (z = linspace(near, far,
        n_samples) along each ray).
    Returns:
      (R, 3) composited ray colors.
    """
    R = ro.shape[0]
    A = danch.shape[1]
    pad = (-R) % tile
    rp = R + pad

    def padT(a, dt):
        return jnp.pad(a, ((0, pad), (0, 0))).T.astype(dt)

    roT = padT(ro, jnp.float32)                    # (3, Rp)
    rdT = padT(rd, jnp.float32)
    pf0T = padT(pf0, jnp.bfloat16)                 # (64, Rp)
    pf1T = padT(pf1, jnp.bfloat16)
    danchT = padT(danch, jnp.float32)              # (A, Rp)
    bmin = bounds[0][:, None].astype(jnp.float32)  # (3, 1)
    bmax = bounds[1][:, None].astype(jnp.float32)

    weights = tuple(packed_offset) + tuple(packed_template)
    weight_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in weights
    ]

    def tile_spec(rows):
        return pl.BlockSpec((rows, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    kern = functools.partial(_ray_color_kernel, n_samples=n_samples,
                             near=near, far=far, threshold=threshold,
                             n_anchors=A)
    out = pl.pallas_call(
        kern,
        grid=(rp // tile,),
        in_specs=[tile_spec(3), tile_spec(3), tile_spec(64),
                  tile_spec(64), tile_spec(A),
                  pl.BlockSpec((3, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((3, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] + weight_specs,
        out_specs=tile_spec(8),
        out_shape=jax.ShapeDtypeStruct((8, rp), jnp.float32),
    )(roT, rdT, pf0T, pf1T, danchT, bmin, bmax, *weights)
    return out[:3, :R].T


@functools.partial(jax.jit, static_argnames=("tile",))
def template_query_fused(packed_weights, pts: jnp.ndarray,
                         tile: int = 2048):
    """Fused DoubleTNet query.

    Args:
      packed_weights: from pack_template_weights.
      pts: (N, 3) canonical points (N padded to a multiple of ``tile``
        internally).
    Returns:
      (rgb (N, 3), alpha (N, 1), occ (N, 1)) matching
      DoubleTNet.__call__ (sdf mode).
    """
    N = pts.shape[0]
    pad = (-N) % tile
    ptsT = jnp.pad(pts, ((0, pad), (0, 0))).T    # (3, Np)
    npad = N + pad

    weight_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in packed_weights
    ]
    out = pl.pallas_call(
        _template_kernel,
        grid=(npad // tile,),
        in_specs=[pl.BlockSpec((3, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)] + weight_specs,
        out_specs=pl.BlockSpec((8, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, npad), jnp.float32),
    )(ptsT, *packed_weights)

    out = out[:, :N]
    occ = out[0:1].T
    alpha = out[1:2].T
    rgb = out[2:5].T
    return rgb, alpha, occ
