"""Cropping volumes as masked predicates over fixed-capacity clouds.

TPU-native equivalent of the reference's cropper class hierarchy
(reference: open3d_slam_rsl/.../src/croppers.cpp:23-246 — Cylinder,
MinRadius, MaxRadius, MinMaxRadius with an invert flag, pose-settable).
Instead of mutating clouds, each cropper returns a boolean mask; callers
combine it with ``PointCloud.with_mask`` (no reallocation, no dynamic
shapes).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..utils import se3
from ..utils.pointcloud import PointCloud

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CropVolume:
    """Axis-aligned-in-own-frame crop volume, positioned by ``pose``.

    kind is encoded by which bounds are finite:
      min_radius / max_radius: spherical shell (MinMaxRadius cropper)
      cylinder_radius / half_height: vertical cylinder (Cylinder cropper)
    ``invert`` keeps the complement (reference croppers.cpp invert flag).
    """

    pose: Array  # 4x4, volume frame in cloud frame
    min_radius: Array
    max_radius: Array
    cylinder_radius: Array
    half_height: Array
    invert: Array  # bool scalar

    def contains(self, xyz: Array) -> Array:
        local = se3.apply(se3.inverse(self.pose), xyz[None, ...])[0] if xyz.ndim == 2 else xyz
        r = jnp.linalg.norm(local, axis=-1)
        rho = jnp.linalg.norm(local[..., :2], axis=-1)
        z = jnp.abs(local[..., 2])
        inside = (r >= self.min_radius) & (r <= self.max_radius)
        inside &= (rho <= self.cylinder_radius) & (z <= self.half_height)
        return jnp.where(self.invert, jnp.logical_not(inside), inside)

    def crop_mask(self, cloud: PointCloud) -> Array:
        return jnp.logical_and(cloud.mask, self.contains(cloud.xyz))

    def crop(self, cloud: PointCloud) -> PointCloud:
        return cloud.with_mask(self.contains(cloud.xyz))

    def with_pose(self, pose: Array) -> "CropVolume":
        return dataclasses.replace(self, pose=pose)


_INF = jnp.float32(3.0e38)


def _vol(pose=None, min_radius=0.0, max_radius=_INF, cylinder_radius=_INF,
         half_height=_INF, invert=False) -> CropVolume:
    if pose is None:
        pose = jnp.eye(4, dtype=jnp.float32)
    f = lambda v: jnp.asarray(v, dtype=jnp.float32)
    return CropVolume(
        pose=pose,
        min_radius=f(min_radius),
        max_radius=f(max_radius),
        cylinder_radius=f(cylinder_radius),
        half_height=f(half_height),
        invert=jnp.asarray(invert),
    )


def max_radius_cropper(radius, pose=None, invert=False) -> CropVolume:
    return _vol(pose=pose, max_radius=radius, invert=invert)


def min_radius_cropper(radius, pose=None, invert=False) -> CropVolume:
    return _vol(pose=pose, min_radius=radius, invert=invert)


def min_max_radius_cropper(min_radius, max_radius, pose=None, invert=False) -> CropVolume:
    return _vol(pose=pose, min_radius=min_radius, max_radius=max_radius, invert=invert)


def cylinder_cropper(radius, half_height, pose=None, invert=False) -> CropVolume:
    return _vol(pose=pose, cylinder_radius=radius, half_height=half_height, invert=invert)


def cropper_from_config(kind: str, min_radius, max_radius, pose=None, invert=False) -> CropVolume:
    """Factory by name, mirroring croppingVolumeFactory (croppers.cpp:23-47)."""
    kind = kind.lower()
    if kind in ("maxradius", "max_radius"):
        return max_radius_cropper(max_radius, pose, invert)
    if kind in ("minradius", "min_radius"):
        return min_radius_cropper(min_radius, pose, invert)
    if kind in ("minmaxradius", "min_max_radius"):
        return min_max_radius_cropper(min_radius, max_radius, pose, invert)
    if kind == "cylinder":
        return cylinder_cropper(max_radius, half_height=max_radius, pose=pose, invert=invert)
    raise ValueError(f"unknown cropper kind: {kind}")
