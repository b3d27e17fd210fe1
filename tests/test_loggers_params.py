"""Round-4 registry tail: Logger registrar, Parametrizable-style bounds
validation, structured metrics dump, and the hierarchical morton
downsample's exactness beyond 1024 cells.

Reference: libpointmatcher/pointmatcher/Logger.cpp + LoggerImpl.h:40-80 +
Registry.cpp:126-127 (loggers), Parametrizable.cpp (bounds),
SlamWrapper.cpp:77-78, 989-995 (timing printout -> JSON dump).
"""
import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from open3d_slam_advanced_rss_2024_public_tpu.ops import filters, normals
from open3d_slam_advanced_rss_2024_public_tpu.ops.registration import chain as chain_mod
from open3d_slam_advanced_rss_2024_public_tpu.ops.registration import loggers
from open3d_slam_advanced_rss_2024_public_tpu.ops.registration.parametrizable import (
    InvalidParameter)
from open3d_slam_advanced_rss_2024_public_tpu.utils.pointcloud import make_cloud
from open3d_slam_advanced_rss_2024_public_tpu.utils.timing import StatsRegistry


def _cloud(n=384, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    c = make_cloud(jnp.asarray(pts))
    return normals.estimate_normals(c, radius=1.5, k=8)


# ---------------------------------------------------------------- loggers

def test_file_logger_records_register_calls(tmp_path):
    info = tmp_path / "icp_info.log"
    spec = {
        "matcher": {"KDTreeMatcher": {"knn": 1, "maxDist": 1.0}},
        "errorMinimizer": "PointToPointErrorMinimizer",
        "transformationCheckers": [
            {"CounterTransformationChecker": {"maxIterationCount": 10}}],
        "logger": {"FileLogger": {"infoFileName": str(info)}},
    }
    chain = chain_mod.from_dict(spec)
    assert chain.logger.has_info
    src, ref = _cloud(256, 1), _cloud(384, 0)
    chain.register(src, ref, jnp.eye(4))
    chain.logger.close()
    text = info.read_text()
    assert "PointMatcher::icp" in text
    assert "match ratio" in text


def test_null_logger_default_and_unknown_logger():
    chain = chain_mod.from_dict({"matcher": {"KDTreeMatcher": {"knn": 1}}})
    assert isinstance(chain.logger, loggers.NullLogger)
    with pytest.raises(ValueError, match="unknown logger"):
        chain_mod.from_dict({"logger": "SyslogLogger"})


# ----------------------------------------------------- bounds validation

def test_outlier_ratio_out_of_bounds_rejected():
    with pytest.raises(InvalidParameter, match="ratio"):
        chain_mod.from_dict({
            "outlierFilters": [{"TrimmedDistOutlierFilter": {"ratio": 1.5}}]})


def test_checker_iteration_count_bound():
    with pytest.raises(InvalidParameter, match="maxIterationCount"):
        chain_mod.from_dict({
            "transformationCheckers": [
                {"CounterTransformationChecker": {"maxIterationCount": 0}}]})


def test_filter_prob_bound_and_valid_pass():
    with pytest.raises(InvalidParameter, match="prob"):
        chain_mod.FilterPipeline(
            [("RandomSamplingDataPointsFilter", {"prob": 0.0})])
    # In-bounds params construct fine.
    chain_mod.FilterPipeline(
        [("RandomSamplingDataPointsFilter", {"prob": 0.5})])
    chain_mod.from_dict({
        "outlierFilters": [{"TrimmedDistOutlierFilter": {"ratio": 0.9}}]})


def test_non_numeric_bounded_param_rejected():
    with pytest.raises(InvalidParameter, match="not numeric"):
        chain_mod.from_dict({
            "outlierFilters": [{"TrimmedDistOutlierFilter": {"ratio": "hi"}}]})


# ------------------------------------------------------- metrics dump

def test_stats_registry_json_dump(tmp_path):
    reg = StatsRegistry()
    with reg.time("mapper.scan"):
        pass
    reg.add_stat("fitness", 0.9)
    reg.add_stat("fitness", 0.7)
    path = tmp_path / "metrics.json"
    reg.dump_json(str(path))
    d = json.loads(path.read_text())
    assert d["timers"]["mapper.scan"]["count"] == 1
    assert d["stats"]["fitness"]["n"] == 2
    assert abs(d["stats"]["fitness"]["mean"] - 0.8) < 1e-9


# ------------------------------------- morton downsample span exactness

def test_morton_downsample_exact_beyond_1024_cells():
    """ADVICE r3: a cloud spanning >1024 voxels per axis must not emit
    duplicate (split) voxel entries through the morton path."""
    rng = np.random.RandomState(3)
    # 2000 m span at 0.5 m cells = 4000 cells per axis -> far beyond the
    # single-level morton range; duplicate same-voxel points interleave.
    base = rng.uniform(-1000, 1000, (256, 3)).astype(np.float32)
    pts = np.repeat(base, 4, axis=0)  # 4 copies of each point, interleaved
    rng.shuffle(pts)
    cloud = make_cloud(jnp.asarray(pts))
    out_m = filters.voxel_downsample(cloud, 0.5, capacity=1024, order="morton")
    out_l = filters.voxel_downsample(cloud, 0.5, capacity=1024, order="lex")
    n_m = int(np.asarray(out_m.mask).sum())
    n_l = int(np.asarray(out_l.mask).sum())
    assert n_m == n_l == 256, (n_m, n_l)
    # Same voxel means, order-independent.
    a = np.sort(np.round(np.asarray(out_m.xyz)[np.asarray(out_m.mask)], 4),
                axis=0)
    b = np.sort(np.round(np.asarray(out_l.xyz)[np.asarray(out_l.mask)], 4),
                axis=0)
    np.testing.assert_allclose(a, b, atol=1e-3)
