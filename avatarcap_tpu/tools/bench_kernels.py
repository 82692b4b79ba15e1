"""Kernel-only throughput + MFU for the two hot Pallas kernels.

The full-frame numbers in PERFORMANCE.md are dominated by latency-bound
gather/scatter stages; this probe isolates the two MXU-bound Pallas
kernels (`warp_template_query_fused`, the fused warp+PE+template point
query, and `recon_decode_fused`, the pixel-aligned ReconNet decoder —
reference hot loops at /root/reference/network/arch_avatar.py:366-374
and /root/reference/network/arch_recon.py:47-73) and reports pts/s and
model-FLOP utilization against the v5e bf16 peak.

FLOPs are counted as 2*in*out per matmul from the actual packed weight
shapes (the standard MFU convention: matmul MACs only; the positional
encoding, bias adds and activations ride along for free).

Usage: python -m avatarcap_tpu.tools.bench_kernels [--n 4194304]
"""

from __future__ import annotations

import argparse
import json
import time

V5E_BF16_PEAK_TFLOPS = 197.0   # one v5e chip, bf16 systolic peak


def _matmul_flops_per_point(weight_tuples) -> int:
    """Sum 2*O*I over the (weight, bias) alternating operand tuples."""
    total = 0
    for pack in weight_tuples:
        for w in pack[0::2]:              # even slots are matmul weights
            total += 2 * w.shape[0] * w.shape[1]
    return total


def _time(fn, *args, iters: int = 10):
    # sync() forces a 1-element readback: on the tunneled runtime
    # block_until_ready returns before device execution completes
    from avatarcap_tpu.utils.timers import sync
    out = fn(*args)
    sync(out)                             # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def measure(n: int = 4 * 1024 * 1024, iters: int = 10) -> list:
    """Time both fused kernels at n points; return report dicts."""
    import jax
    import jax.numpy as jnp
    from avatarcap_tpu.models.avatar import GeoTexAvatar
    from avatarcap_tpu.models.recon import ReconNetwork
    from avatarcap_tpu.ops.pallas_query import (pack_recon_weights,
                                                recon_decode_fused,
                                                warp_template_query_fused)
    from avatarcap_tpu.pipeline.avatar import pack_fused_query_weights

    rng = jax.random.PRNGKey(0)
    module = GeoTexAvatar(if_type="sdf")
    avatar_vars = jax.jit(module.init)(
        rng, jnp.zeros((1, 8, 3)), jnp.zeros((1, 256, 256, 6)),
        jnp.zeros((1, 3)))
    packed = pack_fused_query_weights(avatar_vars)
    recon = ReconNetwork()
    recon_vars = jax.jit(recon.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 6)),
        jnp.zeros((1, 8, 3)), jnp.zeros((1, 3)))
    packed_recon = pack_recon_weights(recon_vars["params"]["image_decoder"])

    pts = jax.random.uniform(rng, (n, 3), jnp.float32, -0.5, 0.5)
    pose_feat = jax.random.normal(jax.random.PRNGKey(2), (n, 64),
                                  jnp.bfloat16)
    feats = jax.random.normal(jax.random.PRNGKey(3), (n, 33), jnp.float32)

    reports = []
    dt = _time(lambda p, f: warp_template_query_fused(
        packed["offset"], packed["template"], p, f),
        pts, pose_feat, iters=iters)
    fl = _matmul_flops_per_point([packed["offset"], packed["template"]])
    tf = n * fl / dt / 1e12
    reports.append({
        "kernel": "warp_template_query_fused", "n_points": n,
        "mflop_per_point": round(fl / 1e6, 3),
        "mpts_per_s": round(n / dt / 1e6, 2),
        "tflop_per_s": round(tf, 1),
        "mfu_pct_v5e_bf16": round(100 * tf / V5E_BF16_PEAK_TFLOPS, 1)})

    # per-ray color integral: same MLP core, S=64 samples generated and
    # composited in-kernel (the capture w_nerf path)
    S = 64
    n_rays = max(n // S, 2048)
    ro = jax.random.uniform(rng, (n_rays, 3), jnp.float32, -0.5, 0.5)
    rd = jax.random.normal(jax.random.PRNGKey(4), (n_rays, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    pf0 = jax.random.normal(jax.random.PRNGKey(5), (n_rays, 64),
                            jnp.bfloat16)
    pf1 = jax.random.normal(jax.random.PRNGKey(6), (n_rays, 64),
                            jnp.bfloat16)
    danch = jnp.full((n_rays, 4), 0.01, jnp.float32)
    bounds = jnp.asarray([[-2.0, -2.0, -2.0], [2.0, 2.0, 2.0]])
    from avatarcap_tpu.ops.pallas_query import ray_color_query_fused
    dt = _time(lambda *a: ray_color_query_fused(
        packed["offset"], packed["template"], *a, bounds,
        n_samples=S, near=0.98, far=1.05),
        ro, rd, pf0, pf1, danch, iters=iters)
    tf = n_rays * S * fl / dt / 1e12
    reports.append({
        "kernel": "ray_color_query_fused", "n_points": n_rays * S,
        "mflop_per_point": round(fl / 1e6, 3),
        "mpts_per_s": round(n_rays * S / dt / 1e6, 2),
        "tflop_per_s": round(tf, 1),
        "mfu_pct_v5e_bf16": round(100 * tf / V5E_BF16_PEAK_TFLOPS, 1)})

    dt = _time(lambda f: recon_decode_fused(packed_recon, f),
               feats, iters=iters)
    fl = _matmul_flops_per_point([packed_recon])
    tf = n * fl / dt / 1e12
    reports.append({
        "kernel": "recon_decode_fused", "n_points": n,
        "mflop_per_point": round(fl / 1e6, 3),
        "mpts_per_s": round(n / dt / 1e6, 2),
        "tflop_per_s": round(tf, 1),
        "mfu_pct_v5e_bf16": round(100 * tf / V5E_BF16_PEAK_TFLOPS, 1)})
    return reports


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4 * 1024 * 1024)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    from avatarcap_tpu.utils.timers import enable_compile_cache
    enable_compile_cache()
    for r in measure(args.n, args.iters):
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
