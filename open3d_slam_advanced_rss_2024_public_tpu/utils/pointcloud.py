"""Fixed-capacity masked point clouds — the core array type of the framework.

TPU-native replacement for both Open3D ``PointCloud`` and libpointmatcher's
``DataPoints`` SoA container (reference: libpointmatcher/pointmatcher/
PointMatcher.h:229-409).  XLA needs static shapes, so every cloud carries a
fixed capacity ``N`` plus a validity mask; the "size" of a cloud is
``mask.sum()``.  Invalid lanes hold a far-away sentinel position so that they
never participate in neighbor searches.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

# Sentinel coordinate for invalid points: far outside any plausible map so it
# can never be a nearest neighbor or land in a real voxel.
SENTINEL = 1.0e8


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointCloud:
    """SoA point cloud with a fixed capacity and validity mask.

    xyz:     f32[N, 3]  positions (invalid lanes = SENTINEL)
    normals: f32[N, 3]  unit normals (zeros when absent/invalid)
    mask:    bool[N]    lane validity
    """

    xyz: Array
    normals: Array
    mask: Array

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]

    def count(self) -> Array:
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)

    @property
    def has_normals(self) -> bool:
        return self.normals is not None

    def with_xyz(self, xyz: Array) -> "PointCloud":
        return dataclasses.replace(self, xyz=jnp.where(self.mask[..., None], xyz, SENTINEL))

    def with_normals(self, normals: Array) -> "PointCloud":
        return dataclasses.replace(self, normals=jnp.where(self.mask[..., None], normals, 0.0))

    def with_mask(self, mask: Array) -> "PointCloud":
        """Apply a (sub)mask; invalid lanes are pushed to the sentinel."""
        m = jnp.logical_and(self.mask, mask)
        return PointCloud(
            xyz=jnp.where(m[..., None], self.xyz, SENTINEL),
            normals=jnp.where(m[..., None], self.normals, 0.0),
            mask=m,
        )

    def transform(self, T: Array) -> "PointCloud":
        """Rigid transform of points and normals (masked lanes stay sentinel)."""
        from . import se3

        xyz = se3.apply(T, self.xyz)
        normals = se3.rotate(T, self.normals)
        return PointCloud(
            xyz=jnp.where(self.mask[..., None], xyz, SENTINEL),
            normals=jnp.where(self.mask[..., None], normals, 0.0),
            mask=self.mask,
        )


def make_cloud(xyz, normals=None, mask=None, capacity: Optional[int] = None) -> PointCloud:
    """Build a PointCloud from (host or device) arrays, padding to capacity."""
    xyz = jnp.asarray(xyz, dtype=jnp.float32)
    n = xyz.shape[0]
    if capacity is None:
        capacity = n
    if normals is None:
        normals = jnp.zeros_like(xyz)
    else:
        normals = jnp.asarray(normals, dtype=jnp.float32)
    if mask is None:
        mask = jnp.ones((n,), dtype=bool)
    else:
        mask = jnp.asarray(mask, dtype=bool)
    if capacity < n:
        raise ValueError(f"capacity {capacity} < points {n}")
    pad = capacity - n
    if pad:
        xyz = jnp.concatenate([xyz, jnp.full((pad, 3), SENTINEL, dtype=jnp.float32)])
        normals = jnp.concatenate([normals, jnp.zeros((pad, 3), dtype=jnp.float32)])
        mask = jnp.concatenate([mask, jnp.zeros((pad,), dtype=bool)])
    xyz = jnp.where(mask[:, None], xyz, SENTINEL)
    normals = jnp.where(mask[:, None], normals, 0.0)
    return PointCloud(xyz=xyz, normals=normals, mask=mask)


def empty_cloud(capacity: int) -> PointCloud:
    return PointCloud(
        xyz=jnp.full((capacity, 3), SENTINEL, dtype=jnp.float32),
        normals=jnp.zeros((capacity, 3), dtype=jnp.float32),
        mask=jnp.zeros((capacity,), dtype=bool),
    )


def compact(cloud: PointCloud, capacity: int) -> PointCloud:
    """Pack valid points to the front and truncate/pad to ``capacity``.

    The fixed-shape analogue of the reference's conservativeResize-style
    filtering (libpointmatcher DataPointsFilters mutate N in place).
    Stable order: preserves relative order of valid points.
    """
    n = cloud.capacity
    # Stable partition: sort by (invalid, original index).
    order = jnp.argsort(jnp.where(cloud.mask, 0, 1), stable=True)
    take = order[:capacity] if capacity <= n else jnp.concatenate(
        [order, jnp.zeros((capacity - n,), dtype=order.dtype)]
    )
    mask = cloud.mask[take]
    if capacity > n:
        extra = jnp.arange(capacity) >= n
        mask = jnp.logical_and(mask, jnp.logical_not(extra))
    return PointCloud(
        xyz=jnp.where(mask[:, None], cloud.xyz[take], SENTINEL),
        normals=jnp.where(mask[:, None], cloud.normals[take], 0.0),
        mask=mask,
    )


def concatenate(a: PointCloud, b: PointCloud, capacity: Optional[int] = None) -> PointCloud:
    cap = capacity if capacity is not None else a.capacity + b.capacity
    merged = PointCloud(
        xyz=jnp.concatenate([a.xyz, b.xyz], axis=0),
        normals=jnp.concatenate([a.normals, b.normals], axis=0),
        mask=jnp.concatenate([a.mask, b.mask], axis=0),
    )
    return compact(merged, cap)


def to_numpy(cloud: PointCloud):
    """Extract valid points as host numpy arrays (dynamic shape: host-only)."""
    import numpy as np

    mask = np.asarray(cloud.mask)
    xyz = np.asarray(cloud.xyz)[mask]
    normals = np.asarray(cloud.normals)[mask]
    return xyz, normals
