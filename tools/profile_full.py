"""Per-stage profile of the FULL SlamWrapper system (rollover + features +
loop closures + pose-graph feedback active) — the workload bench.py's
``slam_full_frames_per_s`` measures.

Prints total wall, frames/s, and the GLOBAL_STATS stage table so the
full-system ms/scan budget can be accounted stage by stage (VERDICT r4 #1).

Run on the real chip:  python tools/profile_full.py
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    import jax

    cache = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import numpy as np

    from open3d_slam_advanced_rss_2024_public_tpu.frontends import synthetic
    from open3d_slam_advanced_rss_2024_public_tpu.models.slam import SlamWrapper
    from open3d_slam_advanced_rss_2024_public_tpu.utils.config import load_parameters
    from open3d_slam_advanced_rss_2024_public_tpu.utils.timing import GLOBAL_STATS

    platform = jax.devices()[0].platform
    matcher = "pallas" if platform not in ("cpu", "gpu") else "bruteforce"
    N_SRC = 8192
    S = 100
    key = jax.random.PRNGKey(0)
    world = synthetic.cluttered_world(key, extent=30.0, n_objects=40)
    gt = synthetic.loop_trajectory(S, radius=9.0, center=(15.0, 0.0), z=1.2)
    keys = jax.random.split(jax.random.PRNGKey(7), S)
    scans = [synthetic.render_scan(world, gt[i], keys[i], n_points=N_SRC,
                                   max_range=25.0, noise=0.004)
             for i in range(S)]
    jax.block_until_ready(scans[-1].xyz)
    times_s = [0.1 * i for i in range(S)]

    full_params = load_parameters({"mapper": {
        "mapper_localizer": {
            "is_print_timing_information": False,
            "is_attempt_loop_closures": True,
            "scan_to_map_registration": {
                "min_refinement_fitness": 0.3,
                "scan_to_map_refinement_type": "PointToPlaneIcp",
                "matcher": matcher,
                "icp": {"max_n_iter": 15, "max_correspondence_dist": 0.5},
                "scan_processing": {
                    "voxel_size": 0.1, "point_capacity": N_SRC,
                    "scan_cropping": {"cropping_radius_max": 25.0,
                                      "cropping_radius_min": 0.7}},
                "map_patch_capacity": 32768,
            }},
        "submaps": {"point_capacity": 1 << 17, "submap_size": 8.0,
                    "min_num_range_data": 5},
        "map_builder": {"map_voxel_size": 0.1},
        "place_recognition": {"loop_closure_search_radius": 30.0,
                              "min_submaps_between_loop_closures": 2},
    }})

    def run_full():
        slam = SlamWrapper(full_params)
        slam.set_initial_transform(gt[0])
        slam.start_workers()
        t0 = time.perf_counter()
        for i in range(S):
            slam.add_odometry_pose(times_s[i], gt[i])
            while not slam.add_range_scan(scans[i], times_s[i]):
                time.sleep(0.001)
        t_feed = time.perf_counter() - t0
        slam.finish_processing()
        dt = time.perf_counter() - t0
        slam.stop_workers()
        return slam, dt, t_feed

    print("warmup (compiles background stages)...", file=sys.stderr)
    run_full()
    GLOBAL_STATS.timers.clear()
    GLOBAL_STATS.stats.clear()
    slam, dt, t_feed = run_full()
    fps = S / dt
    print(f"\nfull-system: {fps:.1f} frames/s  total {dt * 1e3:.0f} ms "
          f"(feed {t_feed * 1e3:.0f} ms, finish {(dt - t_feed) * 1e3:.0f} ms)  "
          f"{len(slam.mapper.submaps.submaps)} submaps, "
          f"{slam.loop_closure_count} loop closures")
    print("\n-- stage table (total ms over the run | avg ms | count) --")
    rows = sorted(GLOBAL_STATS.timers.items(),
                  key=lambda kv: -kv[1].total_ms)
    for name, t in rows:
        print(f"{name:35s} {t.total_ms:9.1f} ms  avg {t.avg_ms:8.2f} ms  "
              f"n={t.count}")
    accounted = sum(t.total_ms for _, t in rows)
    print(f"{'(sum of stages)':35s} {accounted:9.1f} ms  "
          f"(wall {dt * 1e3:.0f} ms; stages overlap across threads)")


if __name__ == "__main__":
    main()
