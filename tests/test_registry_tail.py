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


def test_excluded_filters_raise_named_error():
    for name in ("GestaltDataPointsFilter", "ElipsoidsDataPointsFilter"):
        with pytest.raises(ValueError, match="intentionally"):
            chain_mod.FilterPipeline([(name, {})])
