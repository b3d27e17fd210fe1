"""Synthetic LiDAR worlds + deterministic replay sequences.

The reference's integration tests are rosbag replays of real sensors
(SURVEY.md §4.4); for a hermetic, deterministic equivalent we render
virtual LiDAR scans from a procedural world: a long corridor/room complex
with walls, pillars and floor, scanned by a spinning-LiDAR model along a
parameterized trajectory.  Used by the SLAM regression tests and bench.py.
"""
from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import se3
from ..utils.pointcloud import PointCloud, make_cloud
from ..ops import generators


def corridor_world(key, length: float = 80.0, width: float = 8.0, height: float = 4.0,
                   points_per_m2: float = 28.0, n_pillars: int = 14) -> PointCloud:
    """A corridor along +x with side walls, floor, ceiling and random pillars
    (pillars break the translational aliasing of bare corridors)."""
    keys = jax.random.split(key, 8)
    clouds = []

    def wall(key, center, he):
        area = 4.0 * max(he[0], 1e-3) * max(he[1] if he[2] < he[1] else he[2], 1e-3)
        n = int(points_per_m2 * (4 * (he[0] + he[1] + he[2]) ** 2) ** 0.5 * 10)
        b = generators.uniform_box(key, max(n, 500), half_extents=he)
        return b.with_xyz(b.xyz + jnp.asarray(center))

    # Floor + ceiling + side walls as thin boxes.
    clouds.append(wall(keys[0], (length / 2, 0.0, 0.0), (length / 2, width / 2, 0.02)))
    clouds.append(wall(keys[1], (length / 2, 0.0, height), (length / 2, width / 2, 0.02)))
    clouds.append(wall(keys[2], (length / 2, -width / 2, height / 2), (length / 2, 0.02, height / 2)))
    clouds.append(wall(keys[3], (length / 2, width / 2, height / 2), (length / 2, 0.02, height / 2)))
    # Pillars at deterministic pseudo-random positions.
    px = jax.random.uniform(keys[4], (n_pillars,), minval=3.0, maxval=length - 3.0)
    py = jax.random.uniform(keys[5], (n_pillars,), minval=-width / 2 + 1.0, maxval=width / 2 - 1.0)
    pillar_keys = jax.random.split(keys[6], n_pillars)
    for i in range(n_pillars):
        c = generators.uniform_cylinder(pillar_keys[i], 1500, radius=0.3, height=height)
        c = c.with_xyz(c.xyz + jnp.stack([px[i], py[i], jnp.asarray(height / 2)]))
        clouds.append(c)

    xyz = jnp.concatenate([c.xyz for c in clouds], axis=0)
    nrm = jnp.concatenate([c.normals for c in clouds], axis=0)
    mask = jnp.concatenate([c.mask for c in clouds], axis=0)
    return PointCloud(xyz=xyz, normals=nrm, mask=mask)


def cluttered_world(key, extent: float = 30.0, n_objects: int = 40) -> PointCloud:
    """Ground plane + randomly sized/rotated boxes, cylinders and spheres —
    geometry with distinctive local curvature (for place-recognition tests;
    bare corridors alias badly, which is realistic but untestable)."""
    keys = jax.random.split(key, n_objects + 2)
    clouds = []
    ground = generators.uniform_plane(keys[0], 12000, half_extents=(extent / 2, extent / 2))
    ground = ground.with_xyz(ground.xyz + jnp.asarray([extent / 2, 0.0, 0.0]))
    clouds.append(ground)
    for i in range(n_objects):
        k1, k2, k3 = jax.random.split(keys[i + 1], 3)
        kind = int(jax.random.randint(k1, (), 0, 3))
        size = float(jax.random.uniform(k2, (), minval=0.3, maxval=1.6))
        pos = jax.random.uniform(k3, (3,), minval=jnp.asarray([1.0, -extent / 2 + 1, 0.2]),
                                 maxval=jnp.asarray([extent - 1.0, extent / 2 - 1, 2.0]))
        if kind == 0:
            he = (size * 0.7, size * 0.4, size)
            c = generators.uniform_box(k2, 1200, half_extents=he)
            yaw = float(jax.random.uniform(k1, (), maxval=3.14))
            R = se3.so3_exp(jnp.asarray([0.0, 0.0, yaw], jnp.float32))
            c = c.with_xyz(c.xyz @ R.T)
        elif kind == 1:
            c = generators.uniform_cylinder(k2, 1000, radius=size * 0.4, height=size * 2)
        else:
            c = generators.uniform_sphere(k2, 800, radius=size * 0.5)
        clouds.append(c.with_xyz(c.xyz + pos))
    xyz = jnp.concatenate([c.xyz for c in clouds], axis=0)
    nrm = jnp.concatenate([c.normals for c in clouds], axis=0)
    mask = jnp.concatenate([c.mask for c in clouds], axis=0)
    return PointCloud(xyz=xyz, normals=nrm, mask=mask)


def render_scan(world: PointCloud, sensor_pose: np.ndarray, key,
                max_range: float = 30.0, min_range: float = 0.5,
                n_points: int = 8192, noise: float = 0.0) -> PointCloud:
    """Virtual LiDAR: world points within range of the sensor, expressed in
    the sensor frame, randomly subsampled to a fixed budget."""
    T_inv = se3.inverse(jnp.asarray(sensor_pose, jnp.float32))
    local = world.transform(T_inv)
    r = jnp.linalg.norm(jnp.where(local.mask[:, None], local.xyz, 0.0), axis=-1)
    visible = local.with_mask((r > min_range) & (r < max_range))
    # Deterministic random subsample to n_points.
    u = jax.random.uniform(key, (visible.capacity,))
    priority = jnp.where(visible.mask, u, jnp.inf)
    order = jnp.argsort(priority)
    keep = jnp.zeros((visible.capacity,), bool).at[order[:n_points]].set(True)
    visible = visible.with_mask(keep)
    if noise > 0:
        visible = visible.with_xyz(visible.xyz + noise * jax.random.normal(key, visible.xyz.shape))
    from ..utils.pointcloud import compact

    return compact(visible, n_points)


def straight_trajectory(n_steps: int, step: float = 0.4, yaw_rate: float = 0.0,
                        start: Tuple[float, float, float] = (2.0, 0.0, 1.2)) -> List[np.ndarray]:
    """Constant-velocity poses marching along +x (with optional yaw drift)."""
    poses = []
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = start
    for i in range(n_steps):
        poses.append(T.copy())
        dT = np.asarray(se3.make_transform(
            se3.so3_exp(jnp.asarray([0.0, 0.0, yaw_rate], jnp.float32)),
            jnp.asarray([step, 0.0, 0.0], jnp.float32)))
        T = (T @ dT).astype(np.float32)
    return poses


def loop_trajectory(n_steps: int, radius: float = 14.0,
                    center: Tuple[float, float] = (20.0, 0.0),
                    z: float = 1.2) -> List[np.ndarray]:
    """A closed circular loop (for loop-closure tests)."""
    poses = []
    for i in range(n_steps):
        theta = 2.0 * np.pi * i / n_steps
        yaw = theta + np.pi / 2.0
        T = np.asarray(se3.make_transform(
            se3.so3_exp(jnp.asarray([0.0, 0.0, yaw], jnp.float32)),
            jnp.asarray([center[0] + radius * np.cos(theta),
                         center[1] + radius * np.sin(theta), z], jnp.float32)))
        poses.append(np.asarray(T, dtype=np.float32))
    return poses


def perturb_odometry(poses: List[np.ndarray], drift_per_step: float = 0.002,
                     yaw_drift_per_step: float = 0.0005, seed: int = 0) -> List[np.ndarray]:
    """Integrate noisy relative motions — a drifting odometry source
    (what the reference consumes from an external estimator)."""
    rng = np.random.RandomState(seed)
    out = [poses[0].copy()]
    for i in range(1, len(poses)):
        rel = np.linalg.inv(poses[i - 1]) @ poses[i]
        noise_t = drift_per_step * rng.randn(3)
        noise_w = yaw_drift_per_step * rng.randn(3)
        dN = np.asarray(se3.make_transform(se3.so3_exp(jnp.asarray(noise_w, jnp.float32)),
                                           jnp.asarray(noise_t, jnp.float32)))
        out.append((out[-1] @ rel @ dN).astype(np.float32))
    return out
