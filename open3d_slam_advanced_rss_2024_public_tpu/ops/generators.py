"""Synthetic point-cloud generators for tests and benchmarks.

TPU-native counterpart of libpointmatcher's PointCloudGenerator
(reference: libpointmatcher/pointmatcher/PointCloudGenerator.cpp:107-378 —
uniformly sampled sphere/circle/cylinder/plane/box used throughout the
reference's unit tests).  Deterministic via explicit PRNG keys.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.pointcloud import PointCloud, make_cloud

Array = jax.Array


def _finalize(key, xyz, normals, pose_T=None) -> PointCloud:
    cloud = make_cloud(xyz, normals=normals)
    if pose_T is not None:
        cloud = cloud.transform(pose_T)
    return cloud


def uniform_box(key, n: int, half_extents=(1.0, 1.0, 1.0), pose_T=None) -> PointCloud:
    """Points uniformly sampled on the surface of a box, with outward normals."""
    he = jnp.asarray(half_extents, dtype=jnp.float32)
    k1, k2, k3 = jax.random.split(key, 3)
    # Choose a face weighted by its area.
    areas = jnp.array(
        [he[1] * he[2], he[1] * he[2], he[0] * he[2], he[0] * he[2], he[0] * he[1], he[0] * he[1]]
    )
    face = jax.random.choice(k1, 6, shape=(n,), p=areas / jnp.sum(areas))
    uv = jax.random.uniform(k2, (n, 2), minval=-1.0, maxval=1.0)
    sign = jnp.where(face % 2 == 0, 1.0, -1.0)
    axis = face // 2  # 0:x faces, 1:y faces, 2:z faces
    xyz = jnp.zeros((n, 3), dtype=jnp.float32)
    normals = jnp.zeros((n, 3), dtype=jnp.float32)
    for a in range(3):
        o1, o2 = [i for i in range(3) if i != a]
        sel = axis == a
        xyz = xyz.at[:, a].set(jnp.where(sel, sign * he[a], xyz[:, a]))
        xyz = xyz.at[:, o1].set(jnp.where(sel, uv[:, 0] * he[o1], xyz[:, o1]))
        xyz = xyz.at[:, o2].set(jnp.where(sel, uv[:, 1] * he[o2], xyz[:, o2]))
        normals = normals.at[:, a].set(jnp.where(sel, sign, normals[:, a]))
    del k3
    return _finalize(key, xyz, normals, pose_T)


def uniform_sphere(key, n: int, radius: float = 1.0, pose_T=None) -> PointCloud:
    v = jax.random.normal(key, (n, 3))
    v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)
    return _finalize(key, v * radius, v, pose_T)


def uniform_plane(key, n: int, half_extents=(1.0, 1.0), pose_T=None) -> PointCloud:
    uv = jax.random.uniform(key, (n, 2), minval=-1.0, maxval=1.0)
    he = jnp.asarray(half_extents, dtype=jnp.float32)
    xyz = jnp.concatenate([uv * he, jnp.zeros((n, 1))], axis=-1)
    normals = jnp.tile(jnp.array([[0.0, 0.0, 1.0]], dtype=jnp.float32), (n, 1))
    return _finalize(key, xyz, normals, pose_T)


def uniform_cylinder(key, n: int, radius: float = 1.0, height: float = 2.0, pose_T=None) -> PointCloud:
    k1, k2 = jax.random.split(key)
    theta = jax.random.uniform(k1, (n,), minval=0.0, maxval=2.0 * jnp.pi)
    z = jax.random.uniform(k2, (n,), minval=-height / 2, maxval=height / 2)
    xyz = jnp.stack([radius * jnp.cos(theta), radius * jnp.sin(theta), z], axis=-1)
    normals = jnp.stack([jnp.cos(theta), jnp.sin(theta), jnp.zeros_like(z)], axis=-1)
    return _finalize(key, xyz, normals, pose_T)


def lidar_room_scan(key, n: int = 8192, room=(10.0, 8.0, 3.0), sensor=(0.0, 0.0, 1.0),
                    noise: float = 0.0) -> PointCloud:
    """A structured indoor-like scan: walls/floor/ceiling seen from a sensor.

    Used as a stand-in for real LiDAR frames in SLAM-level tests (the
    reference relies on rosbag replays for this; we need something synthetic
    and deterministic).
    """
    k1, k2 = jax.random.split(key)
    box = uniform_box(k1, n, half_extents=(room[0] / 2, room[1] / 2, room[2] / 2))
    xyz = box.xyz
    # Flip normals to face inward (toward the sensor).
    normals = -box.normals
    if noise > 0:
        xyz = xyz + noise * jax.random.normal(k2, xyz.shape)
    sensor = jnp.asarray(sensor, dtype=jnp.float32)
    return make_cloud(xyz - sensor, normals=normals)


def add_noise(key, cloud: PointCloud, sigma: float) -> PointCloud:
    noise = sigma * jax.random.normal(key, cloud.xyz.shape)
    return cloud.with_xyz(cloud.xyz + noise)
