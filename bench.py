"""Benchmark: scan-to-map ICP frames/s on one chip (the SLAM hot path).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference stack's implicit real-time target is processing a
10 Hz LiDAR online (SURVEY.md §6 / BASELINE.md — Robosense RS16 on ANYmal,
no published numbers).  vs_baseline therefore reports the real-time factor
(frames/s ÷ 10); the BASELINE.json north star asks for ≥10x.

The benchmarked unit of work matches the reference's innermost hot loop
cost center (Mapper::addRangeMeasurement -> icp_.compute, SURVEY.md §3.1):
a full scan-to-map registration of a preprocessed scan against a live map
patch (kNN correspondence + trimmed/normal outlier weighting +
point-to-plane GN, up to 15 iterations) with realistic shapes: 8192-point
scan vs 65536-point map patch at 0.5 m correspondence radius.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from open3d_slam_advanced_rss_2024_public_tpu.frontends import synthetic
    from open3d_slam_advanced_rss_2024_public_tpu.ops import hashgrid, normals
    from open3d_slam_advanced_rss_2024_public_tpu.ops.registration import ICPConfig, icp
    from open3d_slam_advanced_rss_2024_public_tpu.utils import se3
    from open3d_slam_advanced_rss_2024_public_tpu.utils.pointcloud import compact

    print(f"devices: {jax.devices()}", file=sys.stderr)

    from open3d_slam_advanced_rss_2024_public_tpu.ops import filters

    N_SRC, N_MAP = 8192, 65536
    key = jax.random.PRNGKey(0)
    world = synthetic.cluttered_world(key, extent=30.0, n_objects=40)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [12.0, 0.0, 1.0]
    ref = synthetic.render_scan(world, pose, jax.random.PRNGKey(1), n_points=N_MAP + 8192,
                                max_range=25.0, noise=0.003)
    # Voxel fusion keeps map clouds lex-sorted by voxel — the layout the
    # Pallas matcher's tile skipping exploits (same as production patches).
    ref = filters.voxel_downsample(ref, 0.05, capacity=N_MAP)
    ref = normals.estimate_normals(ref, radius=0.6, k=16)
    grid = hashgrid.passthrough(ref, 0.5)

    src = compact(ref, N_SRC)
    cfg = ICPConfig(max_iterations=15, matcher="pallas")

    # Realistic per-frame initial-guess error (odometry-prior scale).
    T_err = np.asarray(se3.make_transform(
        se3.so3_exp(jnp.asarray([0.005, -0.004, 0.01], jnp.float32)),
        jnp.asarray([0.06, -0.04, 0.02], jnp.float32)))
    src_moved = src.transform(se3.inverse(jnp.asarray(T_err)))

    step = jax.jit(lambda s, g, T: icp.register(s, g, T, cfg))
    # Warmup/compile.
    res = step(src_moved, grid, jnp.eye(4))
    jax.block_until_ready(res.transform)
    iters = int(res.iterations)
    print(f"warmup: iterations={iters} match_ratio={float(res.match_ratio):.3f} "
          f"rmse={float(res.rmse):.4f}", file=sys.stderr)

    n_rep = 50
    t0 = time.perf_counter()
    for _ in range(n_rep):
        res = step(src_moved, grid, jnp.eye(4))
    jax.block_until_ready(res.transform)
    dt = (time.perf_counter() - t0) / n_rep
    fps = 1.0 / dt
    print(f"scan2map ICP: {dt * 1e3:.2f} ms/frame, {fps:.1f} frames/s "
          f"({iters} GN iters, {N_SRC}x{N_MAP})", file=sys.stderr)

    print(json.dumps({
        "metric": "scan2map_icp_frames_per_s",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 2),
    }))


if __name__ == "__main__":
    main()
