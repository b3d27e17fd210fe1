"""Full-loop SLAM regression: submaps + loop closure + pose graph on a
synthetic loop trajectory (≙ the reference's rosbag-replay benchmarking
path, SURVEY.md §3.3, made hermetic)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from open3d_slam_advanced_rss_2024_public_tpu.frontends import synthetic
from open3d_slam_advanced_rss_2024_public_tpu.models.slam import SlamWrapper
from open3d_slam_advanced_rss_2024_public_tpu.utils import io
from open3d_slam_advanced_rss_2024_public_tpu.utils.config import load_parameters


def loop_params():
    return load_parameters({
        "mapper": {
            "mapper_localizer": {
                "is_print_timing_information": False,
                "is_attempt_loop_closures": True,
                "scan_to_map_registration": {
                    "min_refinement_fitness": 0.25,
                    "scan_to_map_refinement_type": "PointToPlaneIcp",
                    "icp": {"max_n_iter": 15, "max_correspondence_dist": 0.6},
                    "scan_processing": {
                        "voxel_size": 0.15, "point_capacity": 4096,
                        "scan_cropping": {"cropping_radius_max": 18.0,
                                          "cropping_radius_min": 0.5},
                    },
                    "map_patch_capacity": 12288,
                },
            },
            "submaps": {"point_capacity": 24576, "submap_size": 8.0,
                        "min_num_range_data": 3, "submaps_num_scan_overlap": 3},
            "map_builder": {"map_voxel_size": 0.12},
            "place_recognition": {
                "feature_voxel_size": 0.4,
                "feature_map_normal_estimation_radius": 1.2,
                "feature_radius": 1.8,
                "ransac_min_corresondence_set_size": 20,
                "min_icp_refinement_fitness": 0.4,
                "max_icp_correspondence_distance": 0.5,
                "loop_closure_search_radius": 12.0,
                "min_submaps_between_loop_closures": 0,
                "feature_point_capacity": 4096,
                "ransac_batch_size": 4096,
            },
        }
    })


@pytest.mark.slow
def test_loop_closure_improves_trajectory():
    world = synthetic.cluttered_world(jax.random.PRNGKey(11), extent=34.0, n_objects=50)
    n = 48
    gt = synthetic.loop_trajectory(n, radius=10.0, center=(17.0, 0.0), z=1.0)
    gt.append(gt[0])  # close the loop physically
    odom = synthetic.perturb_odometry(gt, drift_per_step=0.015,
                                      yaw_drift_per_step=0.002, seed=3)
    slam = SlamWrapper(loop_params())
    slam.set_initial_transform(gt[0])
    keys = jax.random.split(jax.random.PRNGKey(0), n + 1)
    for i in range(n + 1):
        scan = synthetic.render_scan(world, gt[i], keys[i], n_points=6144,
                                     max_range=18.0, noise=0.004)
        slam.use_pair_for_registration(scan, odom[i], 0.1 * i)
    slam.finish_processing()

    est = np.stack(slam.trajectory_poses)
    gt_arr = np.stack(gt[: len(est)])
    odom_arr = np.stack(odom[: len(est)])
    ate_est = io.ate_rmse(est, gt_arr, align=False)
    ate_odom = io.ate_rmse(odom_arr, gt_arr, align=False)

    assert len(slam.mapper.submaps.submaps) >= 3
    assert ate_est < ate_odom, f"SLAM {ate_est:.3f} vs odom {ate_odom:.3f}"
    assert ate_est < 0.5, f"ATE {ate_est:.3f} too high"
    # At least one loop closure found and applied on a loop trajectory.
    assert slam.loop_closure_count >= 1


@pytest.mark.slow
def test_offline_replay_artifacts(tmp_path):
    world = synthetic.cluttered_world(jax.random.PRNGKey(12), extent=20.0, n_objects=25)
    gt = synthetic.straight_trajectory(10, step=0.5, start=(2.0, 0.0, 1.0))
    slam = SlamWrapper(loop_params())
    slam.set_initial_transform(gt[0])
    keys = jax.random.split(jax.random.PRNGKey(1), 10)
    for i in range(10):
        scan = synthetic.render_scan(world, gt[i], keys[i], n_points=4096, max_range=15.0)
        slam.use_pair_for_registration(scan, gt[i], 0.1 * i)
    slam.finish_processing()
    # TUM pose log round-trip.
    traj_path = str(tmp_path / "slam_poses")
    slam.save_trajectory(traj_path)
    times, poses = io.load_tum_trajectory(traj_path)
    assert len(times) == 10
    np.testing.assert_allclose(poses[3][:3, 3], slam.trajectory_poses[3][:3, 3], atol=1e-4)
    # Map + submaps + pose graph artifacts.
    msg = slam.save_map(str(tmp_path / "map.pcd"))
    assert "map.pcd" in msg
    reloaded = io.load_pcd(str(tmp_path / "map.pcd"))
    assert int(reloaded.count()) > 1000
    slam.save_submaps(str(tmp_path / "submaps"))
    slam.save_pose_graph(str(tmp_path / "pose_graph.json"))
    import json as _json
    with open(tmp_path / "pose_graph.json") as f:
        d = _json.load(f)
    assert "odometry_constraints" in d


def test_online_workers_smoke():
    """Threaded pipeline produces the same kind of results as offline."""
    world = synthetic.cluttered_world(jax.random.PRNGKey(13), extent=16.0, n_objects=20)
    gt = synthetic.straight_trajectory(6, step=0.4, start=(2.0, 0.0, 1.0))
    slam = SlamWrapper(loop_params())
    slam.set_initial_transform(gt[0])
    slam.start_workers()
    keys = jax.random.split(jax.random.PRNGKey(2), 6)
    import time as _t
    for i in range(6):
        scan = synthetic.render_scan(world, gt[i], keys[i], n_points=4096, max_range=12.0)
        slam.add_odometry_pose(0.1 * i, gt[i])
        while not slam.add_range_scan(scan, 0.1 * i):
            _t.sleep(0.01)
    # Generous deadline: worker threads may hit fresh jit compiles on a
    # loaded CPU CI machine (each shape variant is ~10s to compile there).
    deadline = _t.time() + 180
    while len(slam.trajectory_poses) < 6 and _t.time() < deadline:
        _t.sleep(0.05)
    slam.stop_workers()
    assert len(slam.trajectory_poses) == 6
    err = np.linalg.norm(slam.trajectory_poses[-1][:3, 3] - gt[5][:3, 3])
    assert err < 0.1


def test_online_features_computed_off_map_worker():
    """Async feature computation (≙ SlamWrapper.cpp:1039-1047 std::async):
    when a submap finishes ONLINE, its FPFH/descriptor pass must run on the
    dedicated feature worker — never on the map worker's critical path."""
    import time as _t

    world = synthetic.cluttered_world(jax.random.PRNGKey(14), extent=24.0,
                                      n_objects=24)
    n = 12
    # Travel far enough (> submap_size 8 m) to finish at least one submap.
    gt = synthetic.straight_trajectory(n, step=1.1, start=(2.0, 0.0, 1.0))
    slam = SlamWrapper(loop_params())
    slam.set_initial_transform(gt[0])
    slam.start_workers()
    keys = jax.random.split(jax.random.PRNGKey(3), n)
    for i in range(n):
        scan = synthetic.render_scan(world, gt[i], keys[i], n_points=4096,
                                     max_range=14.0)
        slam.add_odometry_pose(0.1 * i, gt[i])
        while not slam.add_range_scan(scan, 0.1 * i):
            _t.sleep(0.01)
    deadline = _t.time() + 240
    while _t.time() < deadline:
        done = (len(slam.trajectory_poses) >= n
                and len(slam.mapper.submaps.submaps) >= 2
                and not slam.mapper.submaps.finished_queue)
        if done:
            break
        _t.sleep(0.05)
    slam.stop_workers()
    assert len(slam.mapper.submaps.submaps) >= 2, "no rollover happened"
    threads = slam._feature_compute_threads
    assert threads, "features were never computed online"
    assert all(t == "slam-features" for t in threads), threads
    # The finished submap actually got its descriptors.
    assert any(s.features is not None for s in slam.mapper.submaps.submaps)


def test_online_trajectory_ordering_under_bursty_feed():
    """Reader-thread regression (round 5): with a bursty online feed the
    finalized trajectory must stay complete and strictly time-ordered —
    the reader processes blocks in dispatch order even while rollovers
    tag in-flight blocks as tail and the idle poll releases partials."""
    import time as _t

    world = synthetic.cluttered_world(jax.random.PRNGKey(3), extent=14.0,
                                      n_objects=12)
    S = 10
    gt = synthetic.straight_trajectory(S, step=0.6)
    slam = SlamWrapper(loop_params())
    slam.set_initial_transform(gt[0])
    slam.start_workers()
    keys = jax.random.split(jax.random.PRNGKey(5), S)
    for i in range(S):
        # 4096-pt scans REUSE the shapes the other online tests compiled.
        scan = synthetic.render_scan(world, gt[i], keys[i], n_points=4096,
                                     max_range=12.0)
        slam.add_odometry_pose(0.1 * i, gt[i])
        while not slam.add_range_scan(scan, 0.1 * i):
            _t.sleep(0.001)
        if i % 4 == 3:      # bursty: let the queues drain fully
            _t.sleep(0.15)
    slam.finish_processing()
    slam.stop_workers()
    assert len(slam.trajectory_times) == S
    ts = np.asarray(slam.trajectory_times)
    assert (np.diff(ts) > 0).all(), "trajectory times out of order"
    errs = [np.linalg.norm(p[:3, 3] - gt[i][:3, 3])
            for i, p in enumerate(slam.trajectory_poses)]
    assert max(errs) < 0.5
