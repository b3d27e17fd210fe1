"""Loop-closure stack tests: FPFH matching, batched RANSAC, place recognition."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from open3d_slam_advanced_rss_2024_public_tpu.frontends import synthetic
from open3d_slam_advanced_rss_2024_public_tpu.ops import fpfh, filters, normals
from open3d_slam_advanced_rss_2024_public_tpu.ops.registration.ransac import (
    information_matrix_from_point_clouds, register_features)
from open3d_slam_advanced_rss_2024_public_tpu.ops import hashgrid
from open3d_slam_advanced_rss_2024_public_tpu.utils import se3
from open3d_slam_advanced_rss_2024_public_tpu.utils.pointcloud import make_cloud


@pytest.fixture(scope="module")
def scene_pair():
    """Two observations of the same area, offset by a known transform."""
    world = synthetic.cluttered_world(jax.random.PRNGKey(5), extent=30.0)
    pose_a = np.eye(4, dtype=np.float32)
    pose_a[:3, 3] = [10.0, 0.0, 1.2]
    a = synthetic.render_scan(world, pose_a, jax.random.PRNGKey(1), n_points=6000,
                              max_range=16.0, noise=0.004)
    b = synthetic.render_scan(world, pose_a, jax.random.PRNGKey(2), n_points=6000,
                              max_range=16.0, noise=0.004)
    # Offset cloud b by a known SE(3) error (what drift would cause).
    T_true = np.asarray(se3.make_transform(
        se3.so3_exp(jnp.asarray([0.0, 0.0, 0.12], jnp.float32)),
        jnp.asarray([0.8, -0.5, 0.1], jnp.float32)))

    def featurize(cloud):
        ds = filters.voxel_downsample(cloud, 0.3, capacity=4096)
        ds = normals.estimate_normals(ds, radius=1.0, k=20)
        feats = fpfh.compute_fpfh(ds, radius=1.5, k=32)
        return ds, feats

    a_ds, a_feat = featurize(a)
    b_off = b.transform(jnp.asarray(T_true))
    b_ds, b_feat = featurize(b_off)
    return a_ds, a_feat, b_ds, b_feat, np.asarray(T_true)


def test_fpfh_discriminative(scene_pair):
    a_ds, a_feat, *_ = scene_pair
    f = np.asarray(a_feat)[np.asarray(a_ds.mask)]
    # Features are non-trivial and vary across points.
    assert f.std(axis=0).sum() > 1.0
    assert (np.abs(f).sum(axis=1) > 1e-3).mean() > 0.9


def test_ransac_recovers_offset(scene_pair):
    a_ds, a_feat, b_ds, b_feat, T_true = scene_pair
    # Register a (original) onto b (offset): expected transform = T_true.
    T, n_inliers, _, _, _ = register_features(
        a_ds.xyz, a_ds.mask, a_feat, b_ds.xyz, b_ds.mask, b_feat,
        jax.random.PRNGKey(3), max_correspondence_dist=0.75, batch=4096)
    assert int(n_inliers) > 25
    dT = np.asarray(se3.compose(se3.inverse(jnp.asarray(T)), jnp.asarray(T_true)))
    r_err = float(se3.rotation_angle(jnp.asarray(dT)))
    t_err = float(np.linalg.norm(dT[:3, 3]))
    # RANSAC is coarse; ICP refines afterwards. Within 6 deg / 0.5 m here.
    assert r_err < np.deg2rad(6.0), f"rot err {np.rad2deg(r_err)} deg"
    assert t_err < 0.5, f"trans err {t_err} m"


def test_information_matrix(scene_pair):
    a_ds, a_feat, b_ds, b_feat, T_true = scene_pair
    grid = hashgrid.build(b_ds, 0.5)
    info, n = information_matrix_from_point_clouds(
        a_ds.xyz, a_ds.mask, grid, jnp.asarray(T_true), 0.5)
    info = np.asarray(info)
    assert float(n) > 100
    # Symmetric PSD.
    np.testing.assert_allclose(info, info.T, rtol=1e-4, atol=1e-2)
    eigs = np.linalg.eigvalsh(info)
    assert eigs.min() > -1e-2


def test_mutual_correspondences_identity():
    key = jax.random.PRNGKey(0)
    f = jax.random.normal(key, (100, 33))
    mask = jnp.ones(100, bool)
    ab, ok = fpfh.mutual_nearest_correspondences(f, mask, f, mask)
    np.testing.assert_array_equal(np.asarray(ab), np.arange(100))
    assert bool(jnp.all(ok))
