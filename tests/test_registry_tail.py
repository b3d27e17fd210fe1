"""Registry tail (VERDICT r2 item 5): KDTreeVarDistMatcher per-point
max-distance semantics, GenericDescriptorOutlierFilter on attrs,
OrganizedCloudSurfaceNormal window PCA, and the documented exclusions.

Reference: MatchersImpl.h:119-148 (vardist), OutlierFiltersImpl.h:196-221
(generic descriptor), DataPointsFilters/OrganizedCloudSurfaceNormal.cpp,
Registry.cpp:59-131.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from open3d_slam_advanced_rss_2024_public_tpu.ops import hashgrid, normals
from open3d_slam_advanced_rss_2024_public_tpu.ops.registration import chain as chain_mod
from open3d_slam_advanced_rss_2024_public_tpu.utils.pointcloud import make_cloud


def _plane_cloud(n=512, seed=0, z=0.0):
    rng = np.random.RandomState(seed)
    xy = rng.uniform(-3, 3, (n, 2)).astype(np.float32)
    pts = np.concatenate([xy, np.full((n, 1), z, np.float32)], axis=1)
    return pts


def test_vardist_matcher_changes_matching():
    """A kdtreevardist chain must honor per-point maxSearchDist: points
    whose channel is tiny find no matches even though the global maxDist
    would accept them."""
    ref = make_cloud(jnp.asarray(_plane_cloud(512, 0)))
    ref = normals.estimate_normals(ref, radius=1.0, k=12)
    src_pts = _plane_cloud(256, 1) + np.asarray([[0.05, 0.0, 0.1]], np.float32)
    src = make_cloud(jnp.asarray(src_pts))
    src = normals.estimate_normals(src, radius=1.0, k=12)
    # Half the reading gets a generous per-point radius, half a hopeless one.
    vd = np.where(np.arange(256) % 2 == 0, 1.0, 1e-4).astype(np.float32)
    src = src.with_attr("maxSearchDist", jnp.asarray(vd))

    spec = {
        "matcher": {"KDTreeVarDistMatcher": {"knn": 1}},
        "errorMinimizer": "PointToPointErrorMinimizer",
        "transformationCheckers": [
            {"CounterTransformationChecker": {"maxIterationCount": 4}}],
    }
    icp = chain_mod.from_dict(spec)
    assert icp.config.max_dist_field == "maxSearchDist"
    res = icp.register(src, ref, jnp.eye(4))
    # Only the generous half can match: overlap ~0.5, not ~1.0.
    assert 0.3 < float(res.match_ratio) < 0.7, float(res.match_ratio)

    # Identical chain with a plain kdtree matcher matches everything.
    spec_plain = dict(spec)
    spec_plain["matcher"] = {"KDTreeMatcher": {"knn": 1}}
    icp_plain = chain_mod.from_dict(spec_plain)
    res_plain = icp_plain.register(src, ref, jnp.eye(4))
    assert float(res_plain.match_ratio) > 0.9


def test_generic_descriptor_outlier_filter_binary():
    """Matches landing on low-descriptor REFERENCE points get weight zero:
    the registration must ignore a corrupted half-plane."""
    ref_pts = _plane_cloud(512, 2)
    # Corrupt the x>0 half of the reference by a z-shift; mark it bad via
    # the descriptor channel.
    bad = ref_pts[:, 0] > 0
    ref_pts = ref_pts + np.where(bad[:, None],
                                 np.asarray([[0.0, 0.0, 0.4]], np.float32), 0.0)
    ref = make_cloud(jnp.asarray(ref_pts))
    ref = normals.estimate_normals(ref, radius=1.0, k=12)
    ref = ref.with_attr("quality", jnp.asarray((~bad).astype(np.float32)))

    src = make_cloud(jnp.asarray(_plane_cloud(256, 3)))
    src = normals.estimate_normals(src, radius=1.0, k=12)

    spec = {
        "matcher": {"KDTreeMatcher": {"knn": 1, "maxDist": 1.0}},
        "outlierFilters": [
            {"GenericDescriptorOutlierFilter": {
                "source": "reference", "descName": "quality",
                "useSoftThreshold": 0, "useLargerThan": 1,
                "threshold": 0.5}}],
        "errorMinimizer": "PointToPointErrorMinimizer",
        "transformationCheckers": [
            {"CounterTransformationChecker": {"maxIterationCount": 6}}],
    }
    icp = chain_mod.from_dict(spec)
    assert icp.ref_desc_channel == "quality"
    res = icp.register(src, ref, jnp.eye(4))
    T = np.asarray(res.transform)
    # With the corrupted half down-weighted to zero, the solve must stay
    # put (the clean half is an identical plane) instead of splitting the
    # 0.4 m z-offset.
    assert abs(T[2, 3]) < 0.05, T
    # Without the filter the corrupted half drags z upward measurably.
    spec_nof = dict(spec)
    spec_nof.pop("outlierFilters")
    res_nof = chain_mod.from_dict(spec_nof).register(src, ref, jnp.eye(4))
    assert float(np.asarray(res_nof.transform)[2, 3]) > 0.1


def test_organized_surface_normals_plane():
    rows, cols = 16, 32
    u = np.linspace(-1, 1, cols, dtype=np.float32)
    v = np.linspace(-1, 1, rows, dtype=np.float32)
    uu, vv = np.meshgrid(u, v)
    pts = np.stack([uu, vv, 0.3 * uu + 0.1 * vv + 2.0], axis=-1).reshape(-1, 3)
    cloud = make_cloud(jnp.asarray(pts))
    out = normals.organized_surface_normals(cloud, rows, cols, knn=5)
    n_true = np.array([-0.3, -0.1, 1.0])
    n_true /= np.linalg.norm(n_true)
    n = np.asarray(out.normals)
    ok = np.linalg.norm(n, axis=1) > 0.5
    assert ok.mean() > 0.9
    dots = np.abs(n[ok] @ n_true)
    assert (dots > 0.99).mean() > 0.95
    # Descriptors exist and are planar (planarity high, curvature ~0).
    planarity = np.asarray(out.attr("planarity"))
    curvature = np.asarray(out.attr("curvature"))
    assert planarity[ok].mean() > 0.4  # boundary windows drag the mean
    assert curvature[ok].mean() < 0.1
    # Organized filter is reachable from a chain config.
    pipe = chain_mod.FilterPipeline([
        ("OrganizedCloudSurfaceNormalDataPointsFilter",
         {"rows": rows, "cols": cols, "knn": 5})])
    out2 = pipe(cloud)
    np.testing.assert_allclose(np.asarray(out2.normals), n, atol=1e-6)


def _surfel_plane(n=1024, key=0, z_noise=0.0):
    rng = np.random.RandomState(key)
    pts = np.zeros((n, 3), np.float32)
    pts[:, 0] = rng.uniform(-4, 4, n)
    pts[:, 1] = rng.uniform(-4, 4, n)
    pts[:, 2] = 2.0 + z_noise * rng.randn(n)
    return make_cloud(jnp.asarray(pts))


def test_elipsoids_surfels_on_plane():
    """≙ ElipsoidsDataPointsFilter semantics (Elipsoids.cpp:284-501):
    boxes of <= knn points -> surfel mean + smallest-eigval normal +
    descriptors.  (The reference's own unit test is disabled upstream as
    broken — utest/ui/DataFilters.cpp:298-323 — so this asserts the
    documented behavior directly.)"""
    from open3d_slam_advanced_rss_2024_public_tpu.ops import filters_extra as fe

    cloud = _surfel_plane(1024, z_noise=0.002)
    # samplingMethod 1: one surfel per box at the mean.
    out = fe.elipsoids(cloud, jax.random.PRNGKey(1), knn=8, sampling_method=1,
                       keep_weights=True, keep_shapes=True,
                       keep_eigen_values=True)
    n_out = int(out.count())
    assert 1024 // 8 - 8 <= n_out <= 1024 // 8 + 8
    m = np.asarray(out.mask)
    # Surfel normals must match the plane normal.
    nz = np.abs(np.asarray(out.normals)[m][:, 2])
    assert (nz > 0.99).mean() > 0.95
    # Surfel means lie on the plane.
    assert np.allclose(np.asarray(out.xyz)[m][:, 2], 2.0, atol=0.01)
    # weights = points per box; shapes = planar (planarity ~1).
    w = np.asarray(out.attr("weights"))[m]
    assert w.min() >= 3 and w.max() <= 8
    # Shape split: flat surfels -> near-zero sphericality, and planarity
    # + cylindricality carry the in-plane mass (Morton boxes are
    # anisotropic, so the in-plane eigenvalues are unequal).
    planarity = np.asarray(out.attr("shapes0"))[m]
    sphericality = np.asarray(out.attr("shapes2"))[m]
    assert sphericality.mean() < 0.05
    assert planarity.mean() > 0.1
    # Eigenvalues ascend: smallest (out-of-plane) << in-plane spread.
    ev0 = np.asarray(out.attr("eigValues0"))[m]
    ev2 = np.asarray(out.attr("eigValues2"))[m]
    assert (ev0 <= ev2 + 1e-9).all() and ev2.mean() > 100 * max(ev0.mean(), 1e-12)

    # samplingMethod 0: random subsample of ORIGINAL points at ~ratio,
    # carrying the box descriptors.
    out0 = fe.elipsoids(cloud, jax.random.PRNGKey(2), knn=8, ratio=0.5,
                        sampling_method=0, keep_means=True)
    n0 = int(out0.count())
    assert 0.35 * 1024 < n0 < 0.65 * 1024
    # maxBoxDim drops every box when tiny.
    gone = fe.elipsoids(cloud, jax.random.PRNGKey(3), knn=8,
                        sampling_method=1, max_box_dim=1e-6)
    assert int(gone.count()) == 0


def test_gestalt_descriptors():
    """≙ GestaltDataPointsFilter (Gestalt.cpp:214-595): voxel keypoints,
    vertical-normal / planarity gates, 4x8 polar height descriptor."""
    from open3d_slam_advanced_rss_2024_public_tpu.ops import filters_extra as fe

    # A vertical wall: normals horizontal (passes the 10-degree vertical
    # gate), heights vary along the wall.
    rng = np.random.RandomState(0)
    n = 2048
    pts = np.zeros((n, 3), np.float32)
    pts[:, 0] = rng.uniform(-6, 6, n)
    pts[:, 1] = 0.002 * rng.randn(n)
    pts[:, 2] = rng.uniform(0, 3, n)
    cloud = make_cloud(jnp.asarray(pts))
    out = fe.gestalt(cloud, jax.random.PRNGKey(1), ratio=0.9, radius=2.0,
                     vsize=(1.0, 1.0, 1.0), max_keypoints=128,
                     keep_eigen_values=True)
    k = int(out.count())
    assert k > 5
    m = np.asarray(out.mask)
    # Keypoint normals are horizontal (wall).
    nz = np.abs(np.asarray(out.normals)[m][:, 2])
    assert (nz < 0.2).mean() > 0.9
    # Gestalt channels exist: 32 means + 32 variances.
    assert sum(1 for a in out.attr_names if a.startswith("gestaltMeans")) == 32
    assert sum(1 for a in out.attr_names
               if a.startswith("gestaltVariances")) == 32
    # Translation invariance of the descriptor (heights are relative).
    shifted = cloud.transform(jnp.asarray(
        [[1, 0, 0, 5.0], [0, 1, 0, -3.0], [0, 0, 1, 0.0], [0, 0, 0, 1]],
        jnp.float32))
    out_s = fe.gestalt(shifted, jax.random.PRNGKey(1), ratio=0.9, radius=2.0,
                       vsize=(1.0, 1.0, 1.0), max_keypoints=128)
    gm = np.asarray(out.attrs)[:, [out.attr_names.index("gestaltMeans0")]]
    gm_s = np.asarray(out_s.attrs)[:, [out_s.attr_names.index("gestaltMeans0")]]
    both = np.logical_and(m, np.asarray(out_s.mask))
    np.testing.assert_allclose(gm[both], gm_s[both], atol=0.05)


def test_elipsoids_gestalt_reachable_from_chain():
    """All 28 reference DataPointsFilters construct from the registry
    (Registry.cpp:67-95) — the former exclusions are gone."""
    from open3d_slam_advanced_rss_2024_public_tpu.ops import generators

    cloud = generators.lidar_room_scan(jax.random.PRNGKey(0), n=2000,
                                       room=(8.0, 6.0, 3.0))
    pipe = chain_mod.FilterPipeline([
        ("ElipsoidsDataPointsFilter",
         {"knn": 6, "samplingMethod": 1, "keepNormals": 1})])
    out = pipe(cloud)
    assert 0 < int(out.count()) < 2000
    pipe_g = chain_mod.FilterPipeline([
        ("GestaltDataPointsFilter",
         {"ratio": 0.9, "radius": 1.5, "vSizeX": 1, "vSizeY": 1,
          "vSizeZ": 1})])
    out_g = pipe_g(cloud)
    assert int(out_g.count()) > 0
