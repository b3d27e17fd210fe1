"""rosbag container + ROS1 message codec round-trips (≙ reference
RosPointCloud2DeserializerTest.cpp's synthetic-message fixtures and the
rosbag replay path of RosbagRangeDataProcessorRos)."""
import bz2
import struct

import numpy as np
import pytest

from open3d_slam_advanced_rss_2024_public_tpu.frontends import rosbag as rb
from open3d_slam_advanced_rss_2024_public_tpu.utils.pointcloud import make_cloud


def _sample_cloud(n=100, with_normals=True, seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    normals = None
    if with_normals:
        normals = rng.normal(size=(n, 3)).astype(np.float32)
        normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    return make_cloud(xyz, normals=normals)


def test_pointcloud2_roundtrip_with_normals():
    cloud = _sample_cloud(128)
    wire = rb.serialize_pointcloud2(cloud, stamp=12.5, frame_id="lidar")
    msg = rb._deserialize_pointcloud2(wire)
    assert msg.header.frame_id == "lidar"
    assert msg.header.stamp == pytest.approx(12.5, abs=1e-6)
    assert msg.width == 128 and msg.height == 1
    back = msg.to_pointcloud()
    np.testing.assert_allclose(np.asarray(back.xyz)[:128], np.asarray(cloud.xyz)[:128],
                               rtol=0, atol=0)
    assert back.has_normals
    np.testing.assert_allclose(np.asarray(back.normals)[:128],
                               np.asarray(cloud.normals)[:128])


def test_pointcloud2_nonfinite_points_masked():
    xyz = np.array([[1, 2, 3], [np.nan, 0, 0], [4, 5, 6]], np.float32)
    wire = rb.serialize_pointcloud2(make_cloud(xyz), stamp=1.0)
    back = rb._deserialize_pointcloud2(wire).to_pointcloud()
    mask = np.asarray(back.mask)
    assert mask[:3].tolist() == [True, False, True]


def test_odometry_roundtrip():
    T = np.eye(4, dtype=np.float32)
    # rotation about z by 30deg + translation
    c, s = np.cos(0.5), np.sin(0.5)
    T[:2, :2] = [[c, -s], [s, c]]
    T[:3, 3] = [1.0, -2.0, 0.5]
    wire = rb.serialize_odometry(T, stamp=3.25, frame_id="odom", child_frame_id="base")
    msg = rb._deserialize_odometry(wire)
    assert msg.header.frame_id == "odom" and msg.child_frame_id == "base"
    np.testing.assert_allclose(msg.pose, T, atol=1e-6)


def test_bag_write_read_roundtrip(tmp_path):
    path = str(tmp_path / "t.bag")
    w = rb.RosbagWriter(path)
    clouds = [_sample_cloud(64, seed=i) for i in range(3)]
    for i, c in enumerate(clouds):
        w.write_odometry("/odom", np.eye(4, dtype=np.float32), stamp=0.05 + 0.1 * i)
        w.write_pointcloud("/points", c, stamp=0.1 * (i + 1))
    w.close()

    r = rb.RosbagReader(path)
    msgs = list(r.read_messages())
    assert len(msgs) == 6
    assert r.topics() == {"/odom": "nav_msgs/Odometry",
                          "/points": "sensor_msgs/PointCloud2"}
    # time-ordered
    times = [m.time for m in msgs]
    assert times == sorted(times)
    pts = [m for m in msgs if m.topic == "/points"]
    for i, m in enumerate(pts):
        np.testing.assert_allclose(
            np.asarray(m.message.to_pointcloud().xyz)[:64],
            np.asarray(clouds[i].xyz)[:64])


def test_bag_topic_filter(tmp_path):
    path = str(tmp_path / "t.bag")
    w = rb.RosbagWriter(path)
    w.write_pointcloud("/a", _sample_cloud(8), stamp=1.0)
    w.write_pointcloud("/b", _sample_cloud(8), stamp=2.0)
    w.close()
    msgs = list(rb.RosbagReader(path).read_messages(topics=["/b"]))
    assert len(msgs) == 1 and msgs[0].topic == "/b"


def test_bag_bz2_chunk(tmp_path):
    """Reader handles bz2-compressed chunks."""
    path = str(tmp_path / "plain.bag")
    w = rb.RosbagWriter(path)
    w.write_pointcloud("/points", _sample_cloud(32), stamp=1.0)
    w.close()
    # Rewrite the chunk record with bz2 compression.
    with open(path, "rb") as f:
        blob = f.read()
    body = blob[len(rb._MAGIC):]
    pos = 0
    out = bytearray(rb._MAGIC)
    while pos < len(body):
        header, data, pos = rb._read_record(body, pos)
        op = header.get(b"op", b"\x00")[0]
        if op == rb._OP_CHUNK:
            cdata = bz2.compress(data)
            hdr = rb._encode_header({b"op": bytes([rb._OP_CHUNK]),
                                     b"compression": b"bz2",
                                     b"size": struct.pack("<I", len(data))})
            out += struct.pack("<I", len(hdr)) + hdr
            out += struct.pack("<I", len(cdata)) + cdata
        else:
            hdr = rb._encode_header(header)
            out += struct.pack("<I", len(hdr)) + hdr
            out += struct.pack("<I", len(data)) + data
    path2 = str(tmp_path / "bz2.bag")
    with open(path2, "wb") as f:
        f.write(bytes(out))
    msgs = list(rb.RosbagReader(path2).read_messages())
    assert len(msgs) == 1 and msgs[0].message.width == 32


def test_not_a_bag_raises(tmp_path):
    p = tmp_path / "x.bag"
    p.write_bytes(b"garbage file")
    with pytest.raises(ValueError, match="not a rosbag"):
        rb.RosbagReader(str(p))


def test_tf_and_imu_and_clock_decode():
    # TFMessage with one transform
    out = bytearray()
    out += struct.pack("<I", 1)  # array length
    out += struct.pack("<I", 0) + struct.pack("<II", 5, 0)
    out += struct.pack("<I", 3) + b"map"
    out += struct.pack("<I", 4) + b"base"
    out += struct.pack("<3d", 1.0, 2.0, 3.0)
    out += struct.pack("<4d", 0.0, 0.0, 0.0, 1.0)
    tfs = rb._deserialize_tf(bytes(out))
    assert len(tfs) == 1 and tfs[0].child_frame_id == "base"
    np.testing.assert_allclose(tfs[0].transform[:3, 3], [1, 2, 3])

    # Imu
    out = bytearray()
    out += struct.pack("<I", 0) + struct.pack("<II", 7, 500000000)
    out += struct.pack("<I", 3) + b"imu"
    out += struct.pack("<4d", 0, 0, 0, 1) + np.zeros(9).tobytes()
    out += struct.pack("<3d", 0.1, 0.2, 0.3) + np.zeros(9).tobytes()
    out += struct.pack("<3d", 0.0, 0.0, 9.81) + np.zeros(9).tobytes()
    imu = rb._deserialize_imu(bytes(out))
    assert imu.header.stamp == pytest.approx(7.5)
    np.testing.assert_allclose(imu.linear_acceleration, [0, 0, 9.81])

    clk = rb._deserialize_clock(struct.pack("<II", 3, 250000000))
    assert clk.clock == pytest.approx(3.25)


def test_rosbag_sequence_pairs_clouds_with_interpolated_odometry(tmp_path):
    path = str(tmp_path / "seq.bag")
    w = rb.RosbagWriter(path)
    # odometry at 0.0 and 1.0 moving +2m in x; cloud at t=0.5 should get x=+1
    T0 = np.eye(4, dtype=np.float32)
    T1 = np.eye(4, dtype=np.float32)
    T1[0, 3] = 2.0
    w.write_odometry("/odom", T0, stamp=0.0)
    w.write_pointcloud("/points", _sample_cloud(16), stamp=0.5)
    w.write_odometry("/odom", T1, stamp=1.0)
    w.close()
    frames = list(rb.rosbag_sequence(path, "/points", odometry_topic="/odom",
                                     capacity=64))
    assert len(frames) == 1
    assert frames[0].time == pytest.approx(0.5, abs=1e-6)
    assert frames[0].odom_pose is not None
    assert frames[0].odom_pose[0, 3] == pytest.approx(1.0, abs=1e-5)
