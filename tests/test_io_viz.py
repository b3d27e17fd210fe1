"""IO round-trips (PLY/VTK/dispatch), ICPSequence, inspectors, viz export.

Mirrors the reference's IO unit suite (libpointmatcher utest/ui/IO.cpp
CSV/VTK/PLY/PCD round-trips) and the inspector/sequence coverage
(utest/ui/Inspectors.cpp, icp/GeneralTests.cpp icpSequenceTest).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from open3d_slam_advanced_rss_2024_public_tpu.ops import generators, hashgrid, normals
from open3d_slam_advanced_rss_2024_public_tpu.ops.registration import (
    ICPConfig, ICPSequence, inspectors, register,
)
from open3d_slam_advanced_rss_2024_public_tpu.utils import io as cloud_io
from open3d_slam_advanced_rss_2024_public_tpu.utils import se3
from open3d_slam_advanced_rss_2024_public_tpu.utils.pointcloud import make_cloud
from open3d_slam_advanced_rss_2024_public_tpu.frontends import viz


def _cloud(n=200, with_normals=True, seed=0):
    k = jax.random.PRNGKey(seed)
    xyz = jax.random.uniform(k, (n, 3), minval=-5.0, maxval=5.0)
    nrm = None
    if with_normals:
        v = jax.random.normal(jax.random.PRNGKey(seed + 1), (n, 3))
        nrm = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    return make_cloud(xyz, normals=nrm)


def _assert_clouds_equal(a, b, atol=1e-4):
    ma, mb = np.asarray(a.mask), np.asarray(b.mask)
    assert ma.sum() == mb.sum()
    np.testing.assert_allclose(np.asarray(a.xyz)[ma], np.asarray(b.xyz)[mb], atol=atol)


def test_ply_roundtrip_binary_and_ascii(tmp_path):
    cloud = _cloud()
    for binary in (True, False):
        p = str(tmp_path / f"c_{binary}.ply")
        cloud_io.save_ply(p, cloud, binary=binary)
        back = cloud_io.load_ply(p)
        _assert_clouds_equal(cloud, back)
        np.testing.assert_allclose(np.asarray(cloud.normals)[np.asarray(cloud.mask)],
                                   np.asarray(back.normals)[np.asarray(back.mask)],
                                   atol=1e-4)


def test_ply_with_colors_roundtrip(tmp_path):
    cloud = _cloud(50, with_normals=False)
    colors = np.random.default_rng(0).integers(0, 255, (50, 3), dtype=np.uint8)
    p = str(tmp_path / "colored.ply")
    cloud_io.save_ply(p, cloud, binary=True, colors=colors)
    back = cloud_io.load_ply(p)  # colors skipped, xyz must survive
    _assert_clouds_equal(cloud, back)


def test_vtk_roundtrip(tmp_path):
    cloud = _cloud(120)
    p = str(tmp_path / "c.vtk")
    cloud_io.save_vtk(p, cloud)
    back = cloud_io.load_vtk(p)
    _assert_clouds_equal(cloud, back)
    np.testing.assert_allclose(np.asarray(cloud.normals)[np.asarray(cloud.mask)],
                               np.asarray(back.normals)[np.asarray(back.mask)],
                               atol=1e-4)


def test_load_save_cloud_dispatch(tmp_path):
    cloud = _cloud(80)
    for ext in ("pcd", "ply", "vtk"):
        p = str(tmp_path / f"c.{ext}")
        cloud_io.save_cloud(p, cloud)
        back = cloud_io.load_cloud(p)
        _assert_clouds_equal(cloud, back)
    try:
        cloud_io.load_cloud(str(tmp_path / "c.obj"))
        assert False, "should reject unknown ext"
    except ValueError as e:
        assert "unsupported cloud format" in str(e)


# ---------------------------------------------------------------- ICPSequence

def _scene(seed=0, n=2500):
    cloud = generators.lidar_room_scan(jax.random.PRNGKey(seed), n=n,
                                       room=(8.0, 6.0, 3.0))
    return normals.estimate_normals(cloud, radius=0.8, k=12)


def test_icp_sequence_amortized_map():
    ref = _scene()
    seq = ICPSequence(ICPConfig(max_iterations=15))
    assert not seq.has_map()
    try:
        seq.compute(ref, jnp.eye(4))
        assert False, "must require a map"
    except RuntimeError:
        pass
    seq.set_map(ref)
    assert seq.has_map()
    # Several scans against the same persistent reference.
    for i, (rot, tr) in enumerate([([0.01, 0, 0], [0.05, 0, 0]),
                                   ([0, 0.01, 0], [0, -0.05, 0.02]),
                                   ([0, 0, 0.015], [-0.03, 0.02, 0])]):
        T_true = se3.make_transform(se3.so3_exp(jnp.asarray(rot, jnp.float32)),
                                    jnp.asarray(tr, jnp.float32))
        src = ref.transform(se3.inverse(T_true))
        res = seq.compute(src, jnp.eye(4))
        dT = se3.compose(se3.inverse(res.transform), T_true)
        assert float(se3.rotation_angle(dT)) < 0.01, f"scan {i}"
        assert float(se3.translation_norm(dT)) < 0.02, f"scan {i}"
    seq.clear_map()
    assert not seq.has_map()


# ---------------------------------------------------------------- inspectors

def test_register_trace_matches_register():
    ref = _scene()
    grid = hashgrid.build(ref, 0.5)
    T_true = se3.make_transform(se3.so3_exp(jnp.asarray([0.01, -0.005, 0.02])),
                                jnp.asarray([0.08, -0.05, 0.03]))
    src = ref.transform(se3.inverse(T_true))
    cfg = ICPConfig(max_iterations=10)
    trace = inspectors.register_trace(src, grid, jnp.eye(4), cfg)
    assert trace.transforms.shape == (10, 4, 4)
    # The trace's final iterate solves the problem too (no early stop, so it
    # must be at least as converged as the production driver's output).
    res = register(src, grid, jnp.eye(4), cfg)
    dT = se3.compose(se3.inverse(trace.transforms[-1]), res.transform)
    assert float(se3.rotation_angle(dT)) < 1e-3
    assert float(se3.translation_norm(dT)) < 1e-3
    # Deltas must shrink as it converges.
    assert float(trace.trans_deltas[-1]) < float(trace.trans_deltas[0])


def test_dump_iterations_writes_files(tmp_path):
    ref = _scene(n=1200)
    grid = hashgrid.build(ref, 0.5)
    src = ref.transform(se3.inverse(se3.make_transform(
        se3.so3_exp(jnp.asarray([0.0, 0.0, 0.01])), jnp.asarray([0.05, 0.0, 0.0]))))
    cfg = ICPConfig(max_iterations=4)
    paths = inspectors.dump_iterations(src, grid, jnp.eye(4), cfg,
                                       str(tmp_path), prefix="t")
    assert len(paths) == 5  # 4 iterations + stats.csv
    for p in paths:
        assert os.path.exists(p)
    back = cloud_io.load_vtk(paths[0])
    assert int(back.count()) == int(src.count())
    stats = open(paths[-1]).read().splitlines()
    assert stats[0] == "iteration,rot_delta,trans_delta,match_ratio,rmse"
    assert len(stats) == 5


def test_performance_inspector_wrap():
    ref = _scene(n=1200)
    grid = hashgrid.build(ref, 0.5)
    src = ref.transform(se3.inverse(se3.make_transform(
        se3.so3_exp(jnp.asarray([0.0, 0.0, 0.01])), jnp.asarray([0.05, 0.0, 0.0]))))
    insp = inspectors.PerformanceInspector()
    reg = insp.wrap(lambda s, g, T: register(s, g, T, ICPConfig(max_iterations=8)))
    for _ in range(3):
        reg(src, grid, jnp.eye(4))
    s = insp.summary()
    assert s["duration_s"]["count"] == 3
    assert s["iterations"]["mean"] >= 1.0
    assert "duration_s" in insp.dump_stats()


# ---------------------------------------------------------------------- viz

def test_viz_exports(tmp_path):
    from open3d_slam_advanced_rss_2024_public_tpu.models.submap import Submap
    from open3d_slam_advanced_rss_2024_public_tpu.ops import voxel_map

    sms = []
    for i in range(3):
        sm_cloud = _cloud(100, seed=i)
        vm = voxel_map.insert(voxel_map.empty(512), sm_cloud, 0.2)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [2.0 * i, 0.0, 0.0]
        sms.append(Submap(submap_id=i, parent_id=max(i - 1, 0),
                          creation_time=0.0, map=vm, pose=pose, n_scans=1))
    n = viz.save_colored_submaps(str(tmp_path / "sub.ply"), sms)
    assert n > 0
    back = cloud_io.load_ply(str(tmp_path / "sub.ply"))
    assert int(back.count()) == n

    poses = [np.eye(4, dtype=np.float32) for _ in range(5)]
    for i, p in enumerate(poses):
        p[:3, 3] = [i * 1.0, 0.1 * i, 0.0]
    nt = viz.save_trajectory_tube(str(tmp_path / "tube.pcd"), poses)
    assert nt > 0
    assert int(cloud_io.load_pcd(str(tmp_path / "tube.pcd")).count()) == nt

    na = viz.save_submap_origins(str(tmp_path / "axes.ply"), sms)
    assert na == 3 * 3 * 20
