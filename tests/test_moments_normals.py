"""Radius-moments normal estimation (MXU kernel, interpret mode on CPU):
count/covariance correctness and direction parity with the kNN-PCA path
(≙ reference CloudRegistration.cpp:62-75 hybrid normal estimation)."""
import numpy as np
import jax
import jax.numpy as jnp

from open3d_slam_advanced_rss_2024_public_tpu.ops import normals, pallas_moments
from open3d_slam_advanced_rss_2024_public_tpu.utils.pointcloud import make_cloud


def test_radius_moments_counts_and_cov_match_numpy():
    rng = np.random.RandomState(0)
    pts = rng.uniform(0, 4, (500, 3)).astype(np.float32)
    r = 0.7
    count, cov = pallas_moments.radius_moments(
        jnp.asarray(pts), jnp.ones((500,), bool), r, interpret=True)
    d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
    ref_count = (d <= r).sum(1)
    got = np.asarray(count)
    # bf16 pairwise-distance fuzz can flip points EXACTLY at the radius
    # boundary (the kd-tree epsilon-approximation analogue): allow off-by-
    # a-couple on a tiny fraction, never more.
    assert (np.abs(got - ref_count) <= 2).all()
    assert (got == ref_count).mean() > 0.98
    # Covariance parity on points whose neighbor set matched exactly.
    for i in [0, 100, 499]:
        if got[i] != ref_count[i]:
            continue
        nb = pts[d[i] <= r]
        ref_cov = np.cov(nb.T, bias=True)
        np.testing.assert_allclose(np.asarray(cov)[i], ref_cov, atol=2e-3)


def test_estimate_normals_radius_plane():
    # Points on a tilted plane: normal must match the plane normal.
    rng = np.random.RandomState(1)
    uv = rng.uniform(-2, 2, (800, 2)).astype(np.float32)
    n_true = np.array([1.0, 2.0, 2.0]) / 3.0
    b1 = np.array([2.0, -1.0, 0.0]) / np.sqrt(5)
    b2 = np.cross(n_true, b1)
    pts = uv[:, :1] * b1 + uv[:, 1:] * b2 + 5.0 * n_true
    cloud = make_cloud(pts)
    out = normals.estimate_normals_radius(cloud, 0.5, interpret=True)
    n = np.asarray(out.normals)
    dots = np.abs(n @ n_true)
    assert (dots > 0.99).mean() > 0.98


def test_estimate_normals_radius_parity_with_knn():
    # Same scene through both engines: normal directions agree.
    key = jax.random.PRNGKey(2)
    from open3d_slam_advanced_rss_2024_public_tpu.frontends import synthetic

    world = synthetic.cluttered_world(key, extent=10.0, n_objects=8)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [3.0, 0.0, 1.0]
    scan = synthetic.render_scan(world, pose, jax.random.PRNGKey(3),
                                 n_points=1024, max_range=12.0, noise=0.002)
    a = normals.estimate_normals(scan, radius=0.5, k=16)
    b = normals.estimate_normals_radius(scan, 0.5, interpret=True)
    m = np.asarray(scan.mask)
    na, nb = np.asarray(a.normals)[m], np.asarray(b.normals)[m]
    both = (np.linalg.norm(na, axis=1) > 0.5) & (np.linalg.norm(nb, axis=1) > 0.5)
    dots = np.abs(np.sum(na[both] * nb[both], axis=1))
    # kNN caps at 16 neighbors, radius-PCA uses the full ball: allow a
    # small disagreeing tail on curved/edge geometry.
    assert np.median(dots) > 0.99
    assert (dots > 0.9).mean() > 0.85


def test_radius_moments_masked_lanes():
    rng = np.random.RandomState(4)
    pts = rng.uniform(0, 3, (300, 3)).astype(np.float32)
    mask = np.arange(300) % 4 != 0
    pts_sent = np.where(mask[:, None], pts, 1e8).astype(np.float32)
    count, _ = pallas_moments.radius_moments(
        jnp.asarray(pts_sent), jnp.asarray(mask), 0.6, interpret=True)
    d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
    ref = ((d <= 0.6) & mask[None, :]).sum(1)
    got = np.asarray(count)[mask]
    # Same radius-boundary fuzz tolerance as the unmasked test above.
    assert (np.abs(got - ref[mask]) <= 2).all()
    assert (got == ref[mask]).mean() > 0.98
