import jax
import jax.numpy as jnp
import numpy as np

from open3d_slam_advanced_rss_2024_public_tpu.ops import croppers, filters, generators, hashgrid, normals
from open3d_slam_advanced_rss_2024_public_tpu.utils.pointcloud import make_cloud, compact


def brute_force_nn(qs, pts, mask):
    pts = np.where(mask[:, None], pts, 1e8)
    d = np.linalg.norm(qs[:, None, :] - pts[None, :, :], axis=-1)
    return d.argmin(axis=1), d.min(axis=1)


def test_nn_matches_bruteforce():
    key = jax.random.PRNGKey(0)
    cloud = generators.uniform_box(key, 2000, half_extents=(2.0, 2.0, 2.0))
    qkey = jax.random.PRNGKey(1)
    queries = jax.random.uniform(qkey, (300, 3), minval=-2.0, maxval=2.0)
    grid = hashgrid.build(cloud, cell_size=0.5)
    idx, d2, found = hashgrid.query_nn(grid, queries, jnp.ones(300, bool), max_dist=0.5)
    bf_idx, bf_d = brute_force_nn(np.asarray(queries), np.asarray(cloud.xyz), np.asarray(cloud.mask))
    found = np.asarray(found)
    d = np.sqrt(np.asarray(d2))
    # Wherever brute force finds a NN within 0.5, the grid must agree.
    expect_found = bf_d <= 0.5
    assert (found == expect_found).mean() > 0.99
    ok = found & expect_found
    np.testing.assert_allclose(d[ok], bf_d[ok], atol=1e-4)
    # The matched point must actually be at that distance.
    matched = np.asarray(grid.points)[np.asarray(idx)]
    np.testing.assert_allclose(
        np.linalg.norm(matched[ok] - np.asarray(queries)[ok], axis=-1), bf_d[ok], atol=1e-4
    )


def test_knn_counts():
    key = jax.random.PRNGKey(2)
    pts = jax.random.uniform(key, (500, 3), minval=-1.0, maxval=1.0)
    cloud = make_cloud(pts)
    grid = hashgrid.build(cloud, cell_size=0.4)
    idx, d2, ok = hashgrid.query_knn(grid, cloud.xyz, cloud.mask, max_dist=0.4, k=8)
    # Every point finds at least itself.
    assert bool(jnp.all(ok[:, 0]))
    assert float(jnp.max(d2[:, 0])) < 1e-8
    # Distances ascending (among valid neighbors).
    d2n = np.asarray(d2)
    okn = np.asarray(ok)
    diffs = np.diff(d2n, axis=1)
    both_valid = okn[:, 1:] & okn[:, :-1]
    assert np.all(diffs[both_valid] >= -1e-6)


def test_masked_points_never_matched():
    pts = jnp.array([[0.0, 0.0, 0.0], [0.1, 0.0, 0.0]])
    cloud = make_cloud(pts, mask=jnp.array([True, False]))
    grid = hashgrid.build(cloud, cell_size=0.5)
    q = jnp.array([[0.1, 0.0, 0.0]])
    idx, d2, found = hashgrid.query_nn(grid, q, jnp.ones(1, bool), max_dist=0.5)
    assert bool(found[0])
    np.testing.assert_allclose(float(jnp.sqrt(d2[0])), 0.1, atol=1e-5)


def test_voxel_downsample_merges_and_averages():
    pts = jnp.array(
        [[0.01, 0.01, 0.01], [0.09, 0.09, 0.09],  # same voxel at 0.1? no: size 0.2 -> voxel 0
         [0.5, 0.5, 0.5],
         [-0.3, -0.3, -0.3]]
    )
    cloud = make_cloud(pts)
    out = filters.voxel_downsample(cloud, 0.2, capacity=8)
    assert int(out.count()) == 3
    got = np.asarray(out.xyz)[np.asarray(out.mask)]
    # Mean of the two near-origin points must be among the outputs.
    assert np.any(np.all(np.isclose(got, 0.05, atol=1e-5), axis=1))


def test_voxel_downsample_reduces_density():
    key = jax.random.PRNGKey(3)
    cloud = generators.uniform_box(key, 5000, half_extents=(1.0, 1.0, 1.0))
    out = filters.voxel_downsample(cloud, 0.3, capacity=4096)
    n_in, n_out = int(cloud.count()), int(out.count())
    assert n_out < n_in / 4
    # All outputs inside the original bounds (means stay in hull).
    xyz = np.asarray(out.xyz)[np.asarray(out.mask)]
    assert np.all(np.abs(xyz) <= 1.0 + 1e-5)


def test_random_sampling_and_max_count():
    key = jax.random.PRNGKey(4)
    cloud = generators.uniform_sphere(key, 1000)
    half = filters.random_sampling(cloud, jax.random.PRNGKey(5), 0.5)
    frac = int(half.count()) / 1000
    assert 0.4 < frac < 0.6
    capped = filters.max_point_count(cloud, jax.random.PRNGKey(6), 100)
    assert int(capped.count()) == 100


def test_croppers():
    pts = jnp.array([[0.1, 0, 0], [5.0, 0, 0], [0, 0, 30.0]])
    cloud = make_cloud(pts)
    c = croppers.min_max_radius_cropper(1.0, 10.0)
    m = np.asarray(c.crop_mask(cloud))
    assert m.tolist() == [False, True, False]
    cyl = croppers.cylinder_cropper(radius=6.0, half_height=1.0)
    m2 = np.asarray(cyl.crop_mask(cloud))
    assert m2.tolist() == [True, True, False]
    inv = croppers.max_radius_cropper(1.0, invert=True)
    m3 = np.asarray(inv.crop_mask(cloud))
    assert m3.tolist() == [False, True, True]


def test_compact_preserves_order():
    pts = jnp.arange(12, dtype=jnp.float32).reshape(4, 3)
    cloud = make_cloud(pts, mask=jnp.array([False, True, False, True]))
    out = compact(cloud, 2)
    assert int(out.count()) == 2
    np.testing.assert_allclose(np.asarray(out.xyz[0]), [3, 4, 5])
    np.testing.assert_allclose(np.asarray(out.xyz[1]), [9, 10, 11])


def test_normals_on_plane():
    key = jax.random.PRNGKey(7)
    cloud = generators.uniform_plane(key, 2000, half_extents=(2.0, 2.0))
    est = normals.estimate_normals(cloud, radius=0.4, k=16, sensor_origin=(0.0, 0.0, 5.0))
    n = np.asarray(est.normals)[np.asarray(est.mask)]
    has_normal = np.linalg.norm(n, axis=-1) > 0.5
    assert has_normal.mean() > 0.95
    nz = np.abs(n[has_normal][:, 2])
    assert np.quantile(nz, 0.05) > 0.99  # plane normal = +-z, oriented to sensor


def test_normals_on_sphere_point_outward_to_sensor():
    key = jax.random.PRNGKey(8)
    cloud = generators.uniform_sphere(key, 3000, radius=1.0)
    est = normals.estimate_normals(cloud, radius=0.3, k=16, sensor_origin=(0.0, 0.0, 0.0))
    xyz = np.asarray(est.xyz)[np.asarray(est.mask)]
    n = np.asarray(est.normals)[np.asarray(est.mask)]
    valid = np.linalg.norm(n, axis=-1) > 0.5
    # Oriented toward center => n ~ -xyz/|xyz|
    cos = np.sum(n[valid] * (-xyz[valid]), axis=-1)
    assert np.quantile(cos, 0.05) > 0.9


def test_remove_non_finite():
    pts = jnp.array([[0.0, 0, 0], [jnp.nan, 0, 0], [jnp.inf, 1, 1]])
    cloud = make_cloud(pts)
    out = filters.remove_non_finite(cloud)
    assert int(out.count()) == 1
