"""Unit tests for auxiliary components: extra filters, IMU, motion
compensation, transform buffer, config system, map initializer."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from open3d_slam_advanced_rss_2024_public_tpu.models import motion_compensation
from open3d_slam_advanced_rss_2024_public_tpu.models.imu import ImuBuffer
from open3d_slam_advanced_rss_2024_public_tpu.ops import filters_extra, generators
from open3d_slam_advanced_rss_2024_public_tpu.utils import se3
from open3d_slam_advanced_rss_2024_public_tpu.utils.config import (
    SlamParameters, load_parameters)
from open3d_slam_advanced_rss_2024_public_tpu.utils.pointcloud import make_cloud
from open3d_slam_advanced_rss_2024_public_tpu.utils.timebuf import (
    TransformInterpolationBuffer)


# --- transform buffer (≙ TransformInterpolationBuffer.cpp tests) -----------

def T_of(x, yaw=0.0):
    return np.asarray(se3.make_transform(
        se3.so3_exp(jnp.asarray([0, 0, yaw], jnp.float32)),
        jnp.asarray([x, 0, 0], jnp.float32)))


def test_timebuf_interpolation():
    buf = TransformInterpolationBuffer()
    buf.push(0.0, T_of(0.0))
    buf.push(1.0, T_of(2.0))
    mid = buf.lookup(0.5)
    np.testing.assert_allclose(mid[:3, 3], [1.0, 0, 0], atol=1e-5)


def test_timebuf_out_of_order_rejected():
    buf = TransformInterpolationBuffer()
    assert buf.push(1.0, T_of(1.0))
    assert not buf.push(0.5, T_of(0.0))
    assert buf.rejected_pushes == 1


def test_timebuf_extrapolation():
    buf = TransformInterpolationBuffer()
    buf.push(0.0, T_of(0.0))
    buf.push(1.0, T_of(1.0))
    fut = buf.get_transform(2.0)
    np.testing.assert_allclose(fut[:3, 3], [2.0, 0, 0], atol=1e-4)


def test_timebuf_size_limit():
    buf = TransformInterpolationBuffer(size_limit=3)
    for i in range(10):
        buf.push(float(i), T_of(float(i)))
    assert len(buf) == 3
    assert buf.earliest_time() == 7.0


# --- motion compensation ----------------------------------------------------

def test_phase_range():
    xyz = jnp.array([[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    ph = motion_compensation.compute_phase(xyz)
    assert float(ph.min()) >= 0.0 and float(ph.max()) <= 1.0


def test_undistort_zero_twist_is_identity():
    cloud = generators.uniform_sphere(jax.random.PRNGKey(0), 500)
    out = motion_compensation.undistort(cloud, jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(out.xyz), np.asarray(cloud.xyz), atol=1e-5)


def test_undistort_translation_moves_oldest_most():
    # Pure forward motion: points measured early in the sweep (phase 0) get
    # the largest correction.
    xyz = jnp.array([[-1.0, 0.001, 0.0],   # azimuth ~pi -> phase ~0 (oldest)
                     [-1.0, -0.001, 0.0]])  # azimuth ~-pi -> phase ~1 (newest)
    cloud = make_cloud(xyz)
    twist = jnp.array([0.0, 0.0, 0.0, 1.0, 0.0, 0.0])
    out = np.asarray(motion_compensation.undistort(cloud, twist).xyz)
    assert abs(out[0, 0] - (-2.0)) < 0.01   # moved by ~ -1 * twist
    assert abs(out[1, 0] - (-1.0)) < 0.01   # barely moved


# --- IMU ---------------------------------------------------------------------

def test_imu_gravity_alignment():
    buf = ImuBuffer(lowpass_alpha=1.0)
    # IMU tilted: gravity measured along a tilted axis.
    tilt = np.asarray(se3.so3_exp(jnp.asarray([0.3, 0.1, 0.0], jnp.float32)))
    g_meas = tilt.T @ np.array([0.0, 0.0, 9.81])
    for i in range(50):
        buf.push(0.01 * i, g_meas, [0.01, -0.02, 0.005])
    R, bias = buf.estimate_attitude()
    aligned = R @ (g_meas / np.linalg.norm(g_meas))
    np.testing.assert_allclose(aligned, [0, 0, 1], atol=1e-3)
    np.testing.assert_allclose(bias, [0.01, -0.02, 0.005], atol=1e-6)


# --- extra filters ------------------------------------------------------------

def test_shadow_filter_drops_grazing_points():
    xyz = jnp.array([[1.0, 0, 0], [0, 2.0, 0]])
    normals = jnp.array([[1.0, 0, 0],   # facing the sensor: keep
                         [1.0, 0, 0]])  # orthogonal to ray: shadow
    cloud = make_cloud(xyz, normals=normals)
    out = filters_extra.shadow_filter(cloud, eps=0.3)
    assert np.asarray(out.mask).tolist() == [True, False]


def test_fix_step_sampling():
    cloud = generators.uniform_sphere(jax.random.PRNGKey(1), 100)
    out = filters_extra.fix_step_sampling(cloud, step=4)
    assert int(out.count()) == 25


def test_max_quantile_on_axis():
    xyz = jnp.stack([jnp.arange(100, dtype=jnp.float32),
                     jnp.zeros(100), jnp.zeros(100)], axis=1)
    cloud = make_cloud(xyz)
    out = filters_extra.max_quantile_on_axis(cloud, ratio=0.5, axis=0)
    assert 49 <= int(out.count()) <= 52


def test_orient_normals():
    xyz = jnp.array([[1.0, 0, 0]])
    nrm = jnp.array([[1.0, 0, 0]])  # away from origin sensor
    cloud = make_cloud(xyz, normals=nrm)
    out = filters_extra.orient_normals(cloud, sensor=(0, 0, 0))
    np.testing.assert_allclose(np.asarray(out.normals[0]), [-1, 0, 0], atol=1e-6)


def test_normal_space_sampling_balances():
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    plane = generators.uniform_plane(k1, 2000)  # all normals +z
    sphere = generators.uniform_sphere(k2, 200)
    from open3d_slam_advanced_rss_2024_public_tpu.utils.pointcloud import concatenate

    both = concatenate(plane, sphere)
    out = filters_extra.normal_space_sampling(both, jax.random.PRNGKey(3), target=260)
    n = np.asarray(out.normals)[np.asarray(out.mask)]
    frac_up = (n[:, 2] > 0.95).mean()
    # Without balancing ~90% of points would be the +z plane.
    assert frac_up < 0.5


def test_covariance_sampling_keeps_constraining_points():
    cloud = generators.uniform_box(jax.random.PRNGKey(4), 1000)
    out = filters_extra.covariance_sampling(cloud, target=200)
    assert int(out.count()) == 200


# --- config -------------------------------------------------------------------

def test_config_defaults_match_reference_schema():
    p = SlamParameters()
    # Spot-check values against parameter_structure_definitions.lua.
    assert p.mapper.submaps.submap_size == 20.0
    assert p.mapper.place_recognition.ransac_min_corresondence_set_size == 25
    assert p.mapper.map_builder.map_voxel_size == 0.1
    assert p.motion_compensation.scan_duration == 0.1
    assert p.mapper.global_optimization.loop_closure_preference == 2.0


def test_config_strict_unknown_key():
    with pytest.raises(KeyError):
        load_parameters({"mapper": {"not_a_real_key": 1}})


def test_config_deep_override():
    p = load_parameters({"mapper": {"submaps": {"submap_size": 12.5}}})
    assert p.mapper.submaps.submap_size == 12.5
    assert p.mapper.submaps.min_num_range_data == 10  # default preserved


def test_config_file_include(tmp_path):
    import json

    base = {"mapper": {"submaps": {"submap_size": 11.0}}}
    with open(tmp_path / "base.json", "w") as f:
        json.dump(base, f)
    override = {"include": "base.json",
                "mapper": {"submaps": {"min_num_range_data": 5}}}
    with open(tmp_path / "robot.json", "w") as f:
        json.dump(override, f)
    from open3d_slam_advanced_rss_2024_public_tpu.utils.config import (
        load_parameters_file)

    p = load_parameters_file(str(tmp_path / "robot.json"))
    assert p.mapper.submaps.submap_size == 11.0
    assert p.mapper.submaps.min_num_range_data == 5
