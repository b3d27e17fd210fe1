"""YAML/dict-configured ICP chains + the extended filter registry.

Mirrors the reference's chain-construction coverage (libpointmatcher
utest/ui/icp/GeneralTests.cpp iterates yaml configs through the registry)
with synthetic scenes instead of committed golden files.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open3d_slam_advanced_rss_2024_public_tpu.ops import filters_extra, generators
from open3d_slam_advanced_rss_2024_public_tpu.ops.registration import chain as chain_mod
from open3d_slam_advanced_rss_2024_public_tpu.ops.registration import (
    ICPConfig, register_clouds,
)
from open3d_slam_advanced_rss_2024_public_tpu.ops.registration.icp import (
    register_with_covariance,
)
from open3d_slam_advanced_rss_2024_public_tpu.ops import hashgrid, normals
from open3d_slam_advanced_rss_2024_public_tpu.utils import se3


PRODUCTION_CHAIN = {
    # Same schema + module names as the reference's icp.yaml.
    "readingDataPointsFilters": [
        {"RandomSamplingDataPointsFilter": {"prob": 0.9}},
    ],
    "referenceDataPointsFilters": [
        {"SurfaceNormalDataPointsFilter": {"knn": 10, "radius": 0.8}},
    ],
    "matcher": {"KDTreeMatcher": {"knn": 1, "maxDist": 0.5}},
    "outlierFilters": [
        {"TrimmedDistOutlierFilter": {"ratio": 0.90}},
        {"SurfaceNormalOutlierFilter": {"maxAngle": 1.57}},
    ],
    "errorMinimizer": "PointToPlaneErrorMinimizer",
    "transformationCheckers": [
        {"CounterTransformationChecker": {"maxIterationCount": 15}},
        {"DifferentialTransformationChecker": {
            "minDiffRotErr": 0.001, "minDiffTransErr": 0.01, "smoothLength": 3}},
    ],
    "inspector": "NullInspector",
    "logger": "FileLogger",
}


def _scene(key=0, n=3000):
    cloud = generators.lidar_room_scan(jax.random.PRNGKey(key), n=n,
                                       room=(8.0, 6.0, 3.0))
    return normals.estimate_normals(cloud, radius=0.8, k=12)


def _pose(rot, trans):
    return se3.make_transform(se3.so3_exp(jnp.asarray(rot, jnp.float32)),
                              jnp.asarray(trans, jnp.float32))


def test_chain_from_dict_production_schema():
    c = chain_mod.from_dict(PRODUCTION_CHAIN)
    assert c.config.max_iterations == 15
    assert c.config.max_correspondence_dist == 0.5
    assert c.config.minimizer == "point_to_plane"
    assert c.config.outlier_chain == (("trimmed", 0.90), ("surface_normal", 1.57))
    ref = _scene()
    T_true = _pose([0.01, -0.005, 0.02], [0.08, -0.05, 0.03])
    src = ref.transform(se3.inverse(T_true))
    res = c.register(src, ref, jnp.eye(4))
    dT = se3.compose(se3.inverse(res.transform), T_true)
    assert float(se3.rotation_angle(dT)) < 0.01
    assert float(se3.translation_norm(dT)) < 0.02


def test_chain_from_yaml_roundtrip(tmp_path):
    import yaml

    p = tmp_path / "icp.yaml"
    p.write_text(yaml.safe_dump(PRODUCTION_CHAIN))
    c = chain_mod.from_yaml(str(p))
    assert c.config.max_iterations == 15
    assert len(c.reading_filters.specs) == 1
    assert c.reading_filters.specs[0][0] == "randomsampling"


def test_chain_unknown_module_rejected():
    with pytest.raises(ValueError, match="unknown outlier filter"):
        chain_mod.from_dict({"outlierFilters": [{"BogusOutlierFilter": {}}]})
    with pytest.raises(ValueError, match="unknown DataPointsFilter"):
        chain_mod.FilterPipeline([("NotAFilter", {})])
    with pytest.raises(ValueError, match="unknown ICP chain sections"):
        chain_mod.from_dict({"notASection": []})


def test_filter_pipeline_standalone():
    """≙ PointMatcherFilterInterface::process."""
    pipe = chain_mod.FilterPipeline([
        ("MaxDistDataPointsFilter", {"maxDist": 6.0}),
        ("RandomSamplingDataPointsFilter", {"prob": 0.5}),
    ])
    cloud = _scene()
    out = pipe(cloud, jax.random.PRNGKey(3))
    n_in = int(cloud.count())
    n_out = int(out.count())
    assert 0 < n_out < n_in


def test_bound_checker_flags_divergence():
    """BoundTransformationChecker: a wild initial guess must be flagged."""
    ref = _scene()
    cfg = ICPConfig(max_iterations=10, bound_max_rot=0.1, bound_max_trans=0.1)
    T_far = _pose([0.0, 0.0, 0.5], [2.0, 0.0, 0.0])  # way outside bounds
    src = ref.transform(se3.inverse(T_far))
    res = register_clouds(src, ref, jnp.eye(4), cfg)
    # Either it never exceeds the bound (converged to something small) or it
    # gets flagged; with a 2 m offset and 0.1 m bound it must flag.
    assert bool(res.diverged)
    assert not bool(res.converged)


def test_similarity_minimizer_recovers_scale():
    ref = _scene(n=2500)
    scale_true = 1.05
    T_rigid = _pose([0.0, 0.0, 0.01], [0.05, 0.0, 0.0])
    S = np.asarray(T_rigid).copy()
    S[:3, :3] *= scale_true
    # source = inverse-similarity applied reference
    Sinv = np.eye(4, dtype=np.float32)
    Sinv[:3, :3] = np.linalg.inv(S[:3, :3])
    Sinv[:3, 3] = -Sinv[:3, :3] @ S[:3, 3]
    src = ref.transform(jnp.asarray(Sinv))
    cfg = ICPConfig(minimizer="similarity", max_iterations=20,
                    max_correspondence_dist=1.0, use_normal_gate=False)
    res = register_clouds(src, ref, jnp.eye(4), cfg)
    s_est = float(jnp.cbrt(jnp.linalg.det(res.transform[:3, :3])))
    assert abs(s_est - scale_true) < 0.01


def test_register_with_covariance_psd():
    ref = _scene(n=2500)
    T_true = _pose([0.005, 0.0, 0.01], [0.04, -0.02, 0.01])
    src = ref.transform(se3.inverse(T_true))
    grid = hashgrid.build(ref, 0.5)
    res, cov = register_with_covariance(src, grid, jnp.eye(4), ICPConfig(),
                                        sensor_std=0.02)
    cov = np.asarray(cov)
    assert cov.shape == (6, 6)
    assert np.allclose(cov, cov.T, atol=1e-8)
    eig = np.linalg.eigvalsh(cov)
    assert eig.min() > 0.0
    # More points or smaller noise must shrink the covariance.
    _, cov_small = register_with_covariance(src, grid, jnp.eye(4), ICPConfig(),
                                            sensor_std=0.002)
    assert np.trace(np.asarray(cov_small)) < np.trace(cov)


# ---------------------------------------------------------------- new filters

def test_octree_grid_first_point():
    cloud = _scene(n=2000)
    out = filters_extra.octree_grid(cloud, max_size_by_node=0.5, sample_mode=0)
    n_out = int(out.count())
    assert 0 < n_out < int(cloud.count())
    # mask-only: surviving points are a subset of the originals
    kept = np.asarray(out.mask)
    assert np.allclose(np.asarray(out.xyz)[kept], np.asarray(cloud.xyz)[kept])
    # one representative per voxel: recount voxels of survivors
    vox = np.floor(np.asarray(out.xyz)[kept] / 0.5).astype(np.int64)
    uniq = np.unique(vox, axis=0)
    assert len(uniq) == n_out


def test_hidden_point_removal_keeps_closest_per_ray():
    # Two points along the same ray: the far one is hidden.
    xyz = np.array([[2.0, 0.0, 0.0], [4.0, 0.0, 0.001], [0.0, 3.0, 0.0]],
                   dtype=np.float32)
    from open3d_slam_advanced_rss_2024_public_tpu.utils.pointcloud import make_cloud

    cloud = make_cloud(xyz)
    out = filters_extra.hidden_point_removal(cloud)
    mask = np.asarray(out.mask)
    assert bool(mask[0]) and bool(mask[2])
    assert not bool(mask[1])


def test_cut_at_descriptor_threshold_ranges():
    xyz = np.array([[1.0, 0, 0], [5.0, 0, 0], [9.0, 0, 0]], dtype=np.float32)
    from open3d_slam_advanced_rss_2024_public_tpu.utils.pointcloud import make_cloud

    cloud = make_cloud(xyz)
    out = filters_extra.cut_at_descriptor_threshold(cloud, "ranges", 6.0, True)
    assert np.asarray(out.mask).tolist() == [True, True, False]
    out2 = filters_extra.cut_at_descriptor_threshold(cloud, "ranges", 6.0, False)
    assert np.asarray(out2.mask).tolist() == [False, False, True]


def test_remove_sensor_bias_drops_grazing():
    cloud = _scene(n=1500)
    out = filters_extra.remove_sensor_bias(cloud, angle_threshold=0.6)
    ang = np.asarray(filters_extra.incidence_angle(cloud))
    mask_in = np.asarray(cloud.mask)
    mask_out = np.asarray(out.mask)
    has_n = np.linalg.norm(np.asarray(cloud.normals), axis=-1) > 1e-6
    sel = mask_in & has_n
    assert np.all(mask_out[sel] == (ang[sel] <= 0.6))
