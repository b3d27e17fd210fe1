"""Descriptor-channel (attrs) tests: the DataPoints-descriptor analogue.

Covers the reference behaviors: DataPoints descriptor add/get views
(PointMatcher.h:327-409), color aggregation in the dense map
(Voxel.hpp:19-80 AggregatedVoxel::aggregateColor), lossless PointCloud2
descriptor round-trip (RosPointCloud2Deserializer.cpp), and per-point-time
de-skew (MotionCompensation.cpp:129-148 made exact).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from open3d_slam_advanced_rss_2024_public_tpu.utils.pointcloud import (
    PointCloud, make_cloud, compact, concatenate)
from open3d_slam_advanced_rss_2024_public_tpu.ops import filters, voxel_map
from open3d_slam_advanced_rss_2024_public_tpu.models import motion_compensation as mc
from open3d_slam_advanced_rss_2024_public_tpu.frontends import rosbag as rb
from open3d_slam_advanced_rss_2024_public_tpu.utils import io as uio


@pytest.fixture
def colored_cloud():
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-2, 2, (100, 3)).astype(np.float32)
    return make_cloud(xyz, capacity=128, attrs={
        "intensity": rng.uniform(0, 100, 100).astype(np.float32),
        "r": rng.uniform(0, 1, 100).astype(np.float32),
        "g": rng.uniform(0, 1, 100).astype(np.float32),
        "b": rng.uniform(0, 1, 100).astype(np.float32),
    })


def test_attr_views_and_masking(colored_cloud):
    c = colored_cloud
    assert c.has_attr("intensity")
    assert c.attr("intensity").shape == (128,)
    with pytest.raises(KeyError):
        c.attr("nope")
    # with_attr replaces in place, keeps order
    c2 = c.with_attr("intensity", jnp.ones(128))
    assert c2.attr_names == c.attr_names
    assert float(c2.attr("intensity")[0]) == 1.0
    # masking zeros attrs on dead lanes
    m = jnp.arange(128) < 10
    c3 = c.with_mask(m)
    assert float(jnp.abs(c3.attrs[10:]).sum()) == 0.0
    # compaction and concatenation carry channels
    c4 = compact(c3, 16)
    assert c4.attr_names == c.attr_names
    c5 = concatenate(c, c4)
    assert c5.attr_names == c.attr_names


def test_attrs_survive_jit_and_transform(colored_cloud):
    c = colored_cloud

    @jax.jit
    def f(cloud):
        return cloud.transform(jnp.eye(4))

    out = f(c)
    assert out.attr_names == c.attr_names
    np.testing.assert_allclose(np.asarray(out.attrs), np.asarray(c.attrs), atol=1e-6)


def test_voxel_downsample_averages_attrs():
    # Two points in one voxel: averaged intensity.
    c = make_cloud(np.array([[0.1, 0.1, 0.1], [0.2, 0.1, 0.1], [5.0, 5.0, 5.0]],
                            np.float32),
                   attrs={"intensity": np.array([2.0, 4.0, 8.0], np.float32)})
    d = filters.voxel_downsample(c, 1.0, capacity=4)
    vals = sorted(np.asarray(d.attr("intensity"))[np.asarray(d.mask)].tolist())
    assert vals == [3.0, 8.0]


def test_voxel_map_aggregates_color():
    # ≙ AggregatedVoxel::aggregateColor (Voxel.hpp:19-80): running mean.
    vm = voxel_map.empty(64)
    c1 = make_cloud(np.array([[0.1, 0.1, 0.1]], np.float32),
                    attrs={"r": np.array([1.0], np.float32)})
    c2 = make_cloud(np.array([[0.2, 0.2, 0.2]], np.float32),
                    attrs={"r": np.array([0.0], np.float32)})
    vm = voxel_map.insert(vm, c1, 1.0)
    vm = voxel_map.insert(vm, c2, 1.0)
    assert int(vm.count()) == 1
    r = np.asarray(vm.cloud.attr("r"))[np.asarray(vm.cloud.mask)]
    np.testing.assert_allclose(r, [0.5], atol=1e-6)


def test_deskew_uses_time_channel():
    # Pure translation twist: with exact per-point time, correction is linear
    # in t; the last point (t = span) must not move.
    n = 8
    xyz = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (n, 1))
    t = np.linspace(0.0, 0.1, n).astype(np.float32)
    c = make_cloud(xyz, attrs={"t": t})
    twist = jnp.asarray([0, 0, 0, 1.0, 0, 0], jnp.float32)  # 1 m forward/scan
    out = mc.undistort(c, twist)
    x = np.asarray(out.xyz)[:, 0]
    # phase = t/span in [0,1]; correction = (phase-1) * 1m along x.
    np.testing.assert_allclose(x, 1.0 + (t / 0.1 - 1.0), atol=1e-5)


def test_pointcloud2_descriptor_round_trip():
    rng = np.random.default_rng(1)
    xyz = rng.uniform(-2, 2, (50, 3)).astype(np.float32)
    c = make_cloud(xyz, attrs={
        "intensity": rng.uniform(0, 100, 50).astype(np.float32),
        "t": np.linspace(0, 0.09, 50).astype(np.float32),
        "r": rng.uniform(0, 1, 50).astype(np.float32),
        "g": rng.uniform(0, 1, 50).astype(np.float32),
        "b": rng.uniform(0, 1, 50).astype(np.float32)})
    buf = rb.serialize_pointcloud2(c, stamp=1.5)
    back = rb._deserialize_pointcloud2(buf).to_pointcloud()
    for k in ("intensity", "t", "r", "g", "b"):
        assert back.has_attr(k)
        np.testing.assert_allclose(np.asarray(back.attr(k)),
                                   np.asarray(c.attr(k)), atol=1e-5)


def test_packed_rgb_deserialization():
    # PCL packed-float rgb field (the common camera-colored cloud layout).
    import struct
    n = 3
    rgb_u32 = [(255 << 16) | (128 << 8) | 0, (0 << 16) | (255 << 8) | 64, 0x010203]
    rows = b""
    for i in range(n):
        rows += struct.pack("<fff", float(i), 0.0, 0.0)
        rows += struct.pack("<I", rgb_u32[i])
    pc2 = rb.PointCloud2(
        header=rb.Header(seq=0, stamp=0.0, frame_id="l"), height=1, width=n,
        fields=[rb.PointField("x", 0, 7, 1), rb.PointField("y", 4, 7, 1),
                rb.PointField("z", 8, 7, 1), rb.PointField("rgb", 12, 7, 1)],
        is_bigendian=False, point_step=16, row_step=16 * n, data=rows,
        is_dense=True)
    c = pc2.to_pointcloud()
    np.testing.assert_allclose(np.asarray(c.attr("r")), [1.0, 0.0, 1 / 255],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(c.attr("g")), [128 / 255, 1.0, 2 / 255],
                               atol=1e-6)


def test_ply_color_round_trip(tmp_path, colored_cloud):
    p = str(tmp_path / "c.ply")
    uio.save_ply(p, colored_cloud)
    back = uio.load_ply(p)
    for k in ("r", "g", "b"):
        ref = np.asarray(colored_cloud.attr(k))[np.asarray(colored_cloud.mask)]
        np.testing.assert_allclose(np.asarray(back.attr(k)), ref, atol=1 / 254)
