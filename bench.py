"""Benchmark: the SLAM hot path on one chip, measured honestly.

Prints ONE JSON line with the end-to-end pipeline rate as the headline:
  {"metric": "slam_e2e_frames_per_s", "value": N, "unit": "frames/s",
   "vs_baseline": N, "extra": {...}}

Baseline: the reference stack's implicit real-time target is processing a
10 Hz LiDAR online (SURVEY.md §6 / BASELINE.md — Robosense RS16 on ANYmal,
no published numbers).  vs_baseline therefore reports the real-time factor
(frames/s ÷ 10); the BASELINE.json north star asks for ≥10x.

Three measurements, all on independent data (the source scan is rendered
from a DISPLACED pose with sensor noise — it shares no points with the
map, so every correspondence is a real nearest-neighbor, not an exact
duplicate):

1. slam_e2e_frames_per_s (headline): the fused production pipeline
   (models/pipeline.mapper_step — preprocess + map-patch crop + ICP +
   fitness gate + voxel fusion as ONE program) stepped scan-by-scan over a
   100-scan trajectory, including per-scan host dispatch and host-side
   initial-guess math.  ≙ the reference's whole
   Mapper::addRangeMeasurement (Mapper.cpp:168-505) incl. insertion.
2. scan2map_icp_converged_frames_per_s: registration alone, differential
   checker enabled (stops when converged) — the production icp.yaml setup.
3. scan2map_icp_fixed15_frames_per_s: registration alone, forced to run
   the full 15-iteration budget (min_diff thresholds zeroed) — the
   worst-case latency bound (icp.yaml CounterTransformationChecker:15).
"""
import datetime
import json
import subprocess
import sys
import time

import numpy as np


def _provenance():
    """Git commit + timestamp + device string (ADVICE r2: make benchmark
    artifacts auditable round-over-round)."""
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, timeout=10).stdout.strip()
    except Exception:
        commit = "unknown"
    import jax

    return {
        "commit": commit,
        "date": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"),
        "device": str(jax.devices()[0]),
        "jax": jax.__version__,
    }


def main():
    import pathlib

    import jax
    import jax.numpy as jnp

    # Persistent compile cache: axon-tunnel TPU compiles are 20-40 s each;
    # cache them so bench reruns measure compute, not the compiler.
    cache = pathlib.Path(__file__).resolve().parent / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from open3d_slam_advanced_rss_2024_public_tpu.frontends import synthetic
    from open3d_slam_advanced_rss_2024_public_tpu.models import pipeline
    from open3d_slam_advanced_rss_2024_public_tpu.ops import filters, hashgrid, normals
    from open3d_slam_advanced_rss_2024_public_tpu.ops.registration import ICPConfig, icp
    from open3d_slam_advanced_rss_2024_public_tpu.utils import se3
    from open3d_slam_advanced_rss_2024_public_tpu.utils.pointcloud import concatenate

    platform = jax.devices()[0].platform
    print(f"devices: {jax.devices()}", file=sys.stderr)
    matcher = "pallas" if platform not in ("cpu", "gpu") else "bruteforce"

    N_SRC, N_MAP = 8192, 65536
    key = jax.random.PRNGKey(0)
    world = synthetic.cluttered_world(key, extent=30.0, n_objects=40)

    # ---- registration-only metrics (independent scan vs built map) --------
    pose_map = np.eye(4, dtype=np.float32)
    pose_map[:3, 3] = [12.0, 0.0, 1.0]
    # Map: union of three nearby viewpoints fused in world frame.
    map_cloud = None
    for j, off in enumerate([(0.0, 0.0), (-0.4, 0.3), (0.5, -0.3)]):
        p = pose_map.copy()
        p[0, 3] += off[0]
        p[1, 3] += off[1]
        scan = synthetic.render_scan(world, p, jax.random.PRNGKey(10 + j),
                                     n_points=N_MAP // 2, max_range=25.0,
                                     noise=0.003).transform(jnp.asarray(p))
        map_cloud = scan if map_cloud is None else concatenate(
            map_cloud, scan, capacity=N_MAP + N_MAP // 2)
    map_cloud = filters.voxel_downsample(map_cloud, 0.05, capacity=N_MAP)
    map_cloud = normals.estimate_normals(map_cloud, radius=0.6, k=16)
    # Production layout: preprocess_scan / crop_submap_and_index Morton-sort
    # both sides so the tile-sparse NN kernel's AABB admissibility fires.
    map_cloud = hashgrid.morton_sort(map_cloud, 0.5)
    grid = hashgrid.passthrough(map_cloud, 0.5)

    # Source: an INDEPENDENT scan rendered from a displaced pose (sensor
    # frame), with its own noise draw.
    pose_src = pose_map.copy()
    pose_src[:3, 3] += [0.30, -0.20, 0.05]
    src = synthetic.render_scan(world, pose_src, jax.random.PRNGKey(99),
                                n_points=N_SRC, max_range=25.0, noise=0.004)
    src = normals.estimate_normals(src, radius=0.6, k=16)
    src = hashgrid.morton_sort(src, 0.5)
    # Initial guess: true pose with odometry-scale error.
    T_err = np.asarray(se3.make_transform(
        se3.so3_exp(jnp.asarray([0.005, -0.004, 0.01], jnp.float32)),
        jnp.asarray([0.06, -0.04, 0.02], jnp.float32)))
    init_T = jnp.asarray(pose_src @ T_err)

    def time_icp(cfg, label):
        step = jax.jit(lambda s, g, T: icp.register(s, g, T, cfg))
        res = step(src, grid, init_T)
        jax.block_until_ready(res.transform)
        iters = int(res.iterations)
        err = np.asarray(res.transform) @ np.linalg.inv(pose_src)
        terr = float(np.linalg.norm(err[:3, 3]))
        n_rep = 50
        t0 = time.perf_counter()
        for _ in range(n_rep):
            res = step(src, grid, init_T)
        jax.block_until_ready(res.transform)
        dt = (time.perf_counter() - t0) / n_rep
        fps = 1.0 / dt
        print(f"{label}: {dt * 1e3:.2f} ms/frame, {fps:.1f} f/s "
              f"({iters} iters, match {float(res.match_ratio):.3f}, "
              f"trans err {terr * 100:.1f} cm)", file=sys.stderr)
        return fps, iters, terr

    cfg_conv = ICPConfig(max_iterations=15, matcher=matcher,
                         max_correspondence_dist=0.5)
    cfg_fixed = ICPConfig(max_iterations=15, matcher=matcher,
                          max_correspondence_dist=0.5,
                          min_diff_rot=0.0, min_diff_trans=0.0)
    fps_conv, it_conv, err_conv = time_icp(cfg_conv, "icp converged")
    fps_fixed, it_fixed, err_fixed = time_icp(cfg_fixed, "icp fixed-15")

    # ---- end-to-end pipeline over a 100-scan trajectory -------------------
    S = 100
    gt = synthetic.loop_trajectory(S, radius=9.0, center=(15.0, 0.0), z=1.2)
    keys = jax.random.split(jax.random.PRNGKey(7), S)
    scans = [synthetic.render_scan(world, gt[i], keys[i], n_points=N_SRC,
                                   max_range=25.0, noise=0.004)
             for i in range(S)]
    jax.block_until_ready(scans[-1].xyz)

    pcfg = pipeline.PipelineConfig(
        icp=ICPConfig(max_iterations=15, matcher=matcher,
                      max_correspondence_dist=0.5),
        scan_voxel_size=0.1, scan_capacity=N_SRC,
        crop_max_radius=25.0, map_patch_capacity=32768,
        map_voxel_size=0.1, min_refinement_fitness=0.3)

    deltas = [np.eye(4, dtype=np.float32)] + [
        (np.linalg.inv(gt[i - 1]) @ gt[i]).astype(np.float32) for i in range(1, S)]

    deltas_dev = [jnp.asarray(d) for d in deltas]

    def run_e2e():
        """Production per-scan driver: the initial guess composes ON DEVICE
        from the odometry delta (pipeline.mapper_step_delta), so the host
        enqueues scan t+1 while scan t runs — zero per-scan syncs; the
        refined poses stream back lazily (here: one block at the end)."""
        state = pipeline.init_state(1 << 17, jnp.asarray(gt[0]))
        for i in range(S):
            state, _ = pipeline.mapper_step_delta(state, scans[i],
                                                  deltas_dev[i], pcfg)
        jax.block_until_ready(state.pose)
        return state

    def run_e2e_hostsync():
        """Same pipeline with a blocking per-scan pose readback (the
        round-2 driver) — reported as extra so the dispatch overhead of
        the tunnel stays visible."""
        state = pipeline.init_state(1 << 17, jnp.asarray(gt[0]))
        for i in range(S):
            est = jnp.asarray(np.asarray(state.pose) @ deltas[i])
            state, _ = pipeline.mapper_step(state, scans[i], est, pcfg)
        jax.block_until_ready(state.pose)
        return state

    state = run_e2e()  # warmup/compile
    final_err = float(np.linalg.norm(np.asarray(state.pose)[:3, 3] - gt[-1][:3, 3]))
    print(f"e2e warmup: map={int(state.map.count())} voxels, "
          f"final pose err {final_err * 100:.1f} cm", file=sys.stderr)
    t0 = time.perf_counter()
    state = run_e2e()
    dt = (time.perf_counter() - t0) / S
    fps_e2e = 1.0 / dt
    print(f"slam e2e: {dt * 1e3:.2f} ms/scan, {fps_e2e:.1f} frames/s "
          f"({S}-scan loop, {N_SRC}-pt scans, 128k map)", file=sys.stderr)
    state_h = run_e2e_hostsync()  # warmup (separate jit entry)
    t0 = time.perf_counter()
    state_h = run_e2e_hostsync()
    fps_e2e_sync = S / (time.perf_counter() - t0)
    print(f"slam e2e host-sync: {1e3 / fps_e2e_sync:.2f} ms/scan, "
          f"{fps_e2e_sync:.1f} frames/s", file=sys.stderr)

    print(json.dumps({
        "metric": "slam_e2e_frames_per_s",
        "value": round(fps_e2e, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps_e2e / 10.0, 2),
        "extra": {
            "scan2map_icp_converged_frames_per_s": round(fps_conv, 2),
            "scan2map_icp_converged_iters": it_conv,
            "scan2map_icp_fixed15_frames_per_s": round(fps_fixed, 2),
            "icp_trans_err_cm": round(err_conv * 100, 2),
            "e2e_final_pose_err_cm": round(final_err * 100, 2),
            "e2e_hostsync_frames_per_s": round(fps_e2e_sync, 2),
            "provenance": _provenance(),
        },
    }))


if __name__ == "__main__":
    main()
