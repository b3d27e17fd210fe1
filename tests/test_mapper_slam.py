"""SLAM-level regression: scan-to-map odometry on a synthetic sequence.

The reference has no unit tests at this layer — its de-facto integration
test is deterministic rosbag replay with an external ATE check
(SURVEY.md §4.4).  We reproduce that protocol hermetically: render a
synthetic corridor sequence, feed a drifting odometry prior, and require
the mapper's refined trajectory to beat the odometry drift and stay within
an ATE bound of ground truth.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from open3d_slam_advanced_rss_2024_public_tpu.frontends import synthetic
from open3d_slam_advanced_rss_2024_public_tpu.models.mapper import Mapper
from open3d_slam_advanced_rss_2024_public_tpu.utils import io
from open3d_slam_advanced_rss_2024_public_tpu.utils.config import load_parameters


@pytest.fixture(scope="module")
def world():
    return synthetic.corridor_world(jax.random.PRNGKey(42), length=50.0)


def default_params(**mapper_overrides):
    # Shapes sized for the 2-CPU CI box (VERDICT r2 item 4): the physics
    # (voxel 0.15 over a 18 m crop, 3k-pt scans) keeps ICP well-conditioned
    # while the NN sweep stays ~8x cheaper than production shapes.
    overrides = {
        "mapper": {
            "mapper_localizer": {
                "is_print_timing_information": False,
                "scan_to_map_registration": {
                    "min_refinement_fitness": 0.3,
                    "scan_to_map_refinement_type": "PointToPlaneIcp",
                    "icp": {"max_n_iter": 20, "max_correspondence_dist": 0.6},
                    "scan_processing": {
                        "voxel_size": 0.15,
                        "point_capacity": 2048,
                        "scan_cropping": {"cropping_radius_max": 18.0,
                                          "cropping_radius_min": 0.5},
                    },
                    "map_patch_capacity": 8192,
                },
                **mapper_overrides,
            },
            "submaps": {"point_capacity": 24576, "submap_size": 15.0},
            "map_builder": {"map_voxel_size": 0.1},
        }
    }
    return load_parameters(overrides)


def run_sequence(world, n_steps=25, drift=0.004, step=0.4, params=None, noise=0.003):
    gt_poses = synthetic.straight_trajectory(n_steps, step=step)
    odom_poses = synthetic.perturb_odometry(gt_poses, drift_per_step=drift, seed=1)
    params = params or default_params()
    mapper = Mapper(params)
    mapper.set_map_to_range_sensor(odom_poses[0])
    keys = jax.random.split(jax.random.PRNGKey(0), n_steps)
    times = [0.1 * i for i in range(n_steps)]
    est = []
    for i in range(n_steps):
        scan = synthetic.render_scan(world, gt_poses[i], keys[i], n_points=2048,
                                     noise=noise)
        mapper.odom_buffer.push(times[i], odom_poses[i])
        mapper.add_range_measurement(scan, times[i])
        mapper.flush()  # per-scan pose check: drain the async lag block
        est.append(mapper.map_to_range_sensor.copy())
    mapper.materialize()  # hand the live table back for direct map reads
    return gt_poses, odom_poses, est, mapper


def test_mapper_tracks_straight_line(world):
    gt, odom, est, mapper = run_sequence(world, n_steps=18)
    ate_est = io.ate_rmse(np.stack(est), np.stack(gt), align=False)
    ate_odom = io.ate_rmse(np.stack(odom), np.stack(gt), align=False)
    # The refined trajectory must be accurate in absolute terms.
    assert ate_est < 0.06, f"ATE {ate_est:.3f} m too high (odometry drift {ate_odom:.3f})"
    assert mapper.stats.scans_processed == 18
    # Map contains a reasonable number of fused points.
    assert int(mapper.submaps.active_submap.map.count()) > 3000


def test_mapper_beats_drifting_odometry(world):
    gt, odom, est, mapper = run_sequence(world, n_steps=20, drift=0.012)
    ate_est = io.ate_rmse(np.stack(est), np.stack(gt), align=False)
    ate_odom = io.ate_rmse(np.stack(odom), np.stack(gt), align=False)
    assert ate_odom > 0.03  # the prior actually drifts
    assert ate_est < 0.5 * ate_odom, f"est {ate_est:.3f} vs odom {ate_odom:.3f}"


def test_submap_rollover(world):
    params = default_params()
    gt, odom, est, mapper = run_sequence(world, n_steps=34, step=1.1, params=params)
    # 34 * 1.1 = 37 m traveled with submap_size 15 -> at least 2 submaps.
    assert len(mapper.submaps.submaps) >= 2
    # Adjacency edges exist between consecutive submaps.
    sm = mapper.submaps.submaps
    assert mapper.submaps.adjacency.is_adjacent(sm[0].submap_id, sm[1].submap_id)
    # Finished submaps queued for feature computation.
    assert len(mapper.submaps.finished_queue) >= 1
    done = mapper.submaps.compute_features_for_finished()
    assert len(done) >= 1
    feat_sm = mapper.submaps.submaps[done[0]]
    assert feat_sm.features is not None
    feats = np.asarray(feat_sm.features)
    valid = np.asarray(feat_sm.feature_cloud.mask)
    assert valid.sum() > 100
    # FPFH rows of valid points are non-degenerate.
    assert (np.abs(feats[valid]).sum(axis=1) > 1e-3).mean() > 0.9


def test_mapper_out_of_order_scan(world):
    gt = synthetic.straight_trajectory(10)
    params = default_params()
    mapper = Mapper(params)
    mapper.set_map_to_range_sensor(gt[0])
    keys = jax.random.split(jax.random.PRNGKey(3), 10)
    for i in range(5):
        scan = synthetic.render_scan(world, gt[i], keys[i], n_points=4096)
        mapper.odom_buffer.push(0.1 * i, gt[i])
        mapper.add_range_measurement(scan, 0.1 * i)
    before = mapper.stats.out_of_order
    scan = synthetic.render_scan(world, gt[2], keys[5], n_points=4096)
    mapper.add_range_measurement(scan, 0.2)  # stale timestamp
    assert mapper.stats.out_of_order == before + 1
