"""One-command bag -> full SLAM -> TUM log -> ATE regression (VERDICT r2
item 6): the de-facto integration test of the reference stack
(RosbagRangeDataProcessorRos::processRosbag, reference
RosbagRangeDataProcessorRos.cpp:247-345 — read bag, step the whole SLAM
pipeline scan by scan, dump poses, check against ground truth).

One path, no bypasses: RosbagWriter -> rosbag_sequence pairing ->
frontends.cli.main(--dataset rosbag) -> ReplayRunner -> Mapper (fused
pipeline) -> save_trajectory -> load_tum_trajectory -> ate_rmse.
"""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from open3d_slam_advanced_rss_2024_public_tpu.frontends import cli, rosbag as rb, synthetic
from open3d_slam_advanced_rss_2024_public_tpu.utils import io as io_utils


def _write_synthetic_bag(path, n_steps=10, drift=0.004):
    """Deterministic synthetic bag: rendered corridor scans + drifting
    odometry (what a real robot's odom topic would carry)."""
    world = synthetic.corridor_world(jax.random.PRNGKey(77), length=25.0)
    gt = synthetic.straight_trajectory(n_steps, step=0.4)
    odom = synthetic.perturb_odometry(gt, drift_per_step=drift, seed=3)
    keys = jax.random.split(jax.random.PRNGKey(78), n_steps)
    w = rb.RosbagWriter(path)
    for i in range(n_steps):
        t = 0.1 * (i + 1)
        scan = synthetic.render_scan(world, gt[i], keys[i], n_points=2048,
                                     noise=0.003)
        # Odometry slightly before the cloud so interpolation brackets it.
        w.write_odometry("/odom", odom[i], stamp=t - 0.01)
        w.write_pointcloud("/points", scan, stamp=t)
        w.write_odometry("/odom", odom[i], stamp=t + 0.01)
    w.close()
    return gt


def test_bag_to_slam_to_ate(tmp_path):
    bag = str(tmp_path / "run.bag")
    out = str(tmp_path / "out")
    gt = _write_synthetic_bag(bag)

    # Small-shape params so the 2-CPU box stays fast; schema identical to
    # production (the .lua tier merges onto the same defaults).
    params = {
        "mapper": {
            "mapper_localizer": {
                "scan_to_map_registration": {
                    "scan_to_map_refinement_type": "PointToPlaneIcp",
                    "icp": {"max_n_iter": 12, "max_correspondence_dist": 0.6},
                    "scan_processing": {
                        "voxel_size": 0.15,
                        "point_capacity": 2048,
                        "scan_cropping": {"cropping_radius_max": 18.0,
                                          "cropping_radius_min": 0.5},
                    },
                    "map_patch_capacity": 8192,
                },
            },
            "submaps": {"point_capacity": 16384},
        }
    }
    params_file = str(tmp_path / "params.json")
    with open(params_file, "w") as f:
        json.dump(params, f)

    rc = cli.main(["--dataset", "rosbag", "--bag", bag,
                   "--cloud-topic", "/points", "--odometry-topic", "/odom",
                   "--params", params_file, "--output", out])
    assert rc == 0

    # The run wrote the full persistence set.
    assert os.path.exists(os.path.join(out, "map.pcd"))
    assert os.path.exists(os.path.join(out, "pose_graph.json"))
    times, poses = io_utils.load_tum_trajectory(os.path.join(out, "slam_poses"))
    assert len(times) == len(gt)
    ate = io_utils.ate_rmse(np.asarray(poses), np.stack(gt), align=False)
    assert ate < 0.08, f"bag->SLAM->ATE regression: {ate:.3f} m"
    # The map is a real reconstruction, not empty padding.
    map_cloud = io_utils.load_pcd(os.path.join(out, "map.pcd"), capacity=65536)
    assert int(np.asarray(map_cloud.mask).sum()) > 1500
