"""Live calibration handling (VERDICT r2 item 8): the odometry-frame ->
cloud-frame calibration lookup with retry (≙ reference
OnlineRangeDataProcessorRos::readStaticTransformationIfNeeded,
OnlineRangeDataProcessorRos.cpp:32-102) and the mapper actually consuming
a non-identity calibration in its initial-guess math (Mapper.cpp:265-300).
"""
import numpy as np
import jax

from open3d_slam_advanced_rss_2024_public_tpu.frontends import synthetic
from open3d_slam_advanced_rss_2024_public_tpu.frontends.online import (
    OnlineRangeDataProcessor)
from open3d_slam_advanced_rss_2024_public_tpu.models.mapper import Mapper
from open3d_slam_advanced_rss_2024_public_tpu.models.slam import SlamWrapper
from open3d_slam_advanced_rss_2024_public_tpu.utils import io
from open3d_slam_advanced_rss_2024_public_tpu.utils.config import load_parameters
from open3d_slam_advanced_rss_2024_public_tpu.utils.frames import (
    StaticTransformBuffer)


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    T = np.eye(4, dtype=np.float32)
    T[:2, :2] = [[c, -s], [s, c]]
    return T


def test_static_transform_buffer_paths():
    tf = StaticTransformBuffer()
    assert tf.lookup("a", "a") is not None
    assert tf.lookup("a", "b") is None
    T_ab = _rot_z(0.3)
    T_ab[:3, 3] = [1.0, 2.0, 0.5]
    T_bc = _rot_z(-0.1)
    T_bc[0, 3] = 4.0
    tf.set_transform("a", "b", T_ab)
    tf.set_transform("b", "c", T_bc)
    # Direct, inverse, and 2-hop composition.
    np.testing.assert_allclose(tf.lookup("a", "b"), T_ab, atol=1e-6)
    np.testing.assert_allclose(tf.lookup("b", "a"), np.linalg.inv(T_ab),
                               atol=1e-5)
    np.testing.assert_allclose(tf.lookup("a", "c"), T_ab @ T_bc, atol=1e-5)
    np.testing.assert_allclose(tf.lookup("c", "a"),
                               np.linalg.inv(T_ab @ T_bc), atol=1e-5)


def test_online_calibration_lookup_with_retry():
    slam = SlamWrapper(load_parameters(None))
    tf = StaticTransformBuffer()
    proc = OnlineRangeDataProcessor(slam, tf, odometry_frame="base",
                                    range_sensor_frame="default")
    # No cloud yet -> sensor frame unknown -> retry.
    assert not proc.read_static_transformation_if_needed()
    # First cloud adopts the sensor frame, but the TF is still missing.
    from open3d_slam_advanced_rss_2024_public_tpu.utils.pointcloud import make_cloud
    import jax.numpy as jnp

    scan = make_cloud(jnp.zeros((8, 3)))
    proc.cloud_callback(scan, 0.0, frame_id="lidar")
    assert proc.range_sensor_frame == "lidar"
    assert not proc.calibration_set
    # The TF arrives (via an intermediate frame — exercises composition).
    T_base_imu = _rot_z(0.2)
    T_imu_lidar = _rot_z(0.5)
    T_imu_lidar[:3, 3] = [0.1, 0.0, 0.3]
    tf.set_transform("base", "imu", T_base_imu)
    tf.set_transform("imu", "lidar", T_imu_lidar)
    assert proc.read_static_transformation_if_needed()
    assert proc.calibration_set
    expected = np.linalg.inv(T_base_imu @ T_imu_lidar)  # lidar <- base
    np.testing.assert_allclose(slam.mapper.calibration, expected, atol=1e-5)
    # Identical frames short-circuit to identity.
    slam2 = SlamWrapper(load_parameters(None))
    proc2 = OnlineRangeDataProcessor(slam2, StaticTransformBuffer(),
                                     odometry_frame="lidar",
                                     range_sensor_frame="lidar")
    assert proc2.read_static_transformation_if_needed()
    np.testing.assert_allclose(slam2.mapper.calibration, np.eye(4), atol=1e-7)


def test_mapper_consumes_nonidentity_calibration():
    """Odometry tracked in a body frame rotated 60 deg from the sensor:
    with the calibration installed, the initial-guess conjugation recovers
    the sensor-frame motion and the mapper tracks ground truth."""
    world = synthetic.corridor_world(jax.random.PRNGKey(55), length=20.0)
    n = 6
    gt = synthetic.straight_trajectory(n, step=0.5)
    T_cal = _rot_z(np.pi / 3.0)  # cloud <- odometry-body
    T_cal[:3, 3] = [0.2, -0.1, 0.0]
    params = load_parameters({
        "mapper": {
            "mapper_localizer": {
                # Shapes/statics aligned with test_bag_to_ate so the fused
                # step compiles ONCE per pytest process for both files.
                "scan_to_map_registration": {
                    "scan_to_map_refinement_type": "PointToPlaneIcp",
                    "icp": {"max_n_iter": 12, "max_correspondence_dist": 0.6},
                    "scan_processing": {
                        "voxel_size": 0.15, "point_capacity": 2048,
                        "scan_cropping": {"cropping_radius_max": 18.0,
                                          "cropping_radius_min": 0.5}},
                    "map_patch_capacity": 8192,
                }},
            "submaps": {"point_capacity": 16384},
        }})
    mapper = Mapper(params)
    mapper.set_map_to_range_sensor(gt[0])
    mapper.calibration = T_cal
    keys = jax.random.split(jax.random.PRNGKey(56), n)
    est = []
    for i in range(n):
        scan = synthetic.render_scan(world, gt[i], keys[i], n_points=2048,
                                     noise=0.003)
        # The odometry topic carries the BODY frame pose: O = S @ T_cal
        # (so S = O @ T_cal^-1, which is what the calibration undoes).
        mapper.odom_buffer.push(0.1 * i, gt[i] @ T_cal)
        mapper.add_range_measurement(scan, 0.1 * i)
        mapper.flush()  # per-scan pose check: drain the async lag block
        est.append(mapper.map_to_range_sensor.copy())
    ate = io.ate_rmse(np.stack(est), np.stack(gt), align=False)
    assert ate < 0.06, f"calibrated odometry tracking ATE {ate:.3f}"
