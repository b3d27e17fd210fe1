"""Fixed-capacity masked point clouds — the core array type of the framework.

TPU-native replacement for both Open3D ``PointCloud`` and libpointmatcher's
``DataPoints`` SoA container (reference: libpointmatcher/pointmatcher/
PointMatcher.h:229-409).  XLA needs static shapes, so every cloud carries a
fixed capacity ``N`` plus a validity mask; the "size" of a cloud is
``mask.sum()``.  Invalid lanes hold a far-away sentinel position so that they
never participate in neighbor searches.

Descriptor channels (≙ DataPoints descriptors beyond normals — colors,
intensity, per-point time; reference PointMatcher.h:327-409 and
pointmatcher_ros/src/RosPointCloud2Deserializer.cpp) live in a single
``attrs`` block: f32[N, C] with a static tuple of channel names.  Keeping
them in one array (instead of one field per channel) keeps the pytree
structure stable under jit and lets every gather/scatter/segment op handle
all channels at once.  Canonical channel names: ``intensity``, ``t``
(per-point relative time), ``r``/``g``/``b`` (color in [0,1]).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

# Sentinel coordinate for invalid points: far outside any plausible map so it
# can never be a nearest neighbor or land in a real voxel.
SENTINEL = 1.0e8


@dataclasses.dataclass(frozen=True)
class PointCloud:
    """SoA point cloud with a fixed capacity and validity mask.

    xyz:        f32[N, 3]  positions (invalid lanes = SENTINEL)
    normals:    f32[N, 3]  unit normals (zeros when absent/invalid)
    mask:       bool[N]    lane validity
    attrs:      f32[N, C]  optional descriptor channels (zeros when invalid)
    attr_names: static channel names for ``attrs`` columns
    """

    xyz: Array
    normals: Array
    mask: Array
    attrs: Optional[Array] = None
    attr_names: Tuple[str, ...] = ()

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]

    def count(self) -> Array:
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)

    @property
    def has_normals(self) -> bool:
        return self.normals is not None

    # -- descriptor channels ------------------------------------------------
    def has_attr(self, name: str) -> bool:
        return self.attrs is not None and name in self.attr_names

    def attr(self, name: str) -> Array:
        """One channel as f32[N] (≙ DataPoints::getDescriptorViewByName)."""
        if not self.has_attr(name):
            raise KeyError(f"no attr {name!r}; have {self.attr_names}")
        return self.attrs[..., self.attr_names.index(name)]

    def with_attr(self, name: str, values: Array) -> "PointCloud":
        """Add or replace one descriptor channel
        (≙ DataPoints::addDescriptor, DataPoints.cpp)."""
        col = jnp.where(self.mask, jnp.asarray(values, jnp.float32), 0.0)[..., None]
        if self.attrs is None:
            return dataclasses.replace(self, attrs=col, attr_names=(name,))
        if name in self.attr_names:
            i = self.attr_names.index(name)
            return dataclasses.replace(self, attrs=self.attrs.at[..., i : i + 1].set(col))
        return dataclasses.replace(
            self,
            attrs=jnp.concatenate([self.attrs, col], axis=-1),
            attr_names=self.attr_names + (name,),
        )

    def without_attrs(self) -> "PointCloud":
        return dataclasses.replace(self, attrs=None, attr_names=())

    def with_xyz(self, xyz: Array) -> "PointCloud":
        return dataclasses.replace(self, xyz=jnp.where(self.mask[..., None], xyz, SENTINEL))

    def with_normals(self, normals: Array) -> "PointCloud":
        return dataclasses.replace(self, normals=jnp.where(self.mask[..., None], normals, 0.0))

    def with_mask(self, mask: Array) -> "PointCloud":
        """Apply a (sub)mask; invalid lanes are pushed to the sentinel."""
        m = jnp.logical_and(self.mask, mask)
        return dataclasses.replace(
            self,
            xyz=jnp.where(m[..., None], self.xyz, SENTINEL),
            normals=jnp.where(m[..., None], self.normals, 0.0),
            mask=m,
            attrs=None if self.attrs is None else jnp.where(m[..., None], self.attrs, 0.0),
        )

    def take(self, idx: Array, valid: Optional[Array] = None) -> "PointCloud":
        """Gather lanes by index (shared row-select for filters/compaction);
        ``valid`` additionally masks the gathered lanes."""
        m = self.mask[..., idx] if self.mask.ndim > 1 else self.mask[idx]
        if valid is not None:
            m = jnp.logical_and(m, valid)
        return dataclasses.replace(
            self,
            xyz=jnp.where(m[..., None], self.xyz[..., idx, :], SENTINEL),
            normals=jnp.where(m[..., None], self.normals[..., idx, :], 0.0),
            mask=m,
            attrs=None if self.attrs is None
            else jnp.where(m[..., None], self.attrs[..., idx, :], 0.0),
        )

    def transform(self, T: Array) -> "PointCloud":
        """Rigid transform of points and normals (masked lanes stay sentinel;
        descriptor channels are frame-independent and carried through)."""
        from . import se3

        xyz = se3.apply(T, self.xyz)
        normals = se3.rotate(T, self.normals)
        return dataclasses.replace(
            self,
            xyz=jnp.where(self.mask[..., None], xyz, SENTINEL),
            normals=jnp.where(self.mask[..., None], normals, 0.0),
        )


jax.tree_util.register_dataclass(
    PointCloud,
    data_fields=("xyz", "normals", "mask", "attrs"),
    meta_fields=("attr_names",),
)


def make_cloud(xyz, normals=None, mask=None, capacity: Optional[int] = None,
               attrs: Optional[Dict[str, "jnp.ndarray"]] = None) -> PointCloud:
    """Build a PointCloud from (host or device) arrays, padding to capacity.

    ``attrs`` maps channel name -> f32[N] column.
    """
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
    attr_names: Tuple[str, ...] = ()
    attr_block = None
    if attrs:
        attr_names = tuple(attrs.keys())
        attr_block = jnp.stack(
            [jnp.asarray(attrs[k], jnp.float32).reshape(n) for k in attr_names], axis=-1)
    if capacity < n:
        raise ValueError(f"capacity {capacity} < points {n}")
    pad = capacity - n
    if pad:
        xyz = jnp.concatenate([xyz, jnp.full((pad, 3), SENTINEL, dtype=jnp.float32)])
        normals = jnp.concatenate([normals, jnp.zeros((pad, 3), dtype=jnp.float32)])
        mask = jnp.concatenate([mask, jnp.zeros((pad,), dtype=bool)])
        if attr_block is not None:
            attr_block = jnp.concatenate(
                [attr_block, jnp.zeros((pad, attr_block.shape[-1]), dtype=jnp.float32)])
    xyz = jnp.where(mask[:, None], xyz, SENTINEL)
    normals = jnp.where(mask[:, None], normals, 0.0)
    if attr_block is not None:
        attr_block = jnp.where(mask[:, None], attr_block, 0.0)
    return PointCloud(xyz=xyz, normals=normals, mask=mask,
                      attrs=attr_block, attr_names=attr_names)


def empty_cloud(capacity: int, attr_names: Tuple[str, ...] = ()) -> PointCloud:
    return PointCloud(
        xyz=jnp.full((capacity, 3), SENTINEL, dtype=jnp.float32),
        normals=jnp.zeros((capacity, 3), dtype=jnp.float32),
        mask=jnp.zeros((capacity,), dtype=bool),
        attrs=None if not attr_names
        else jnp.zeros((capacity, len(attr_names)), dtype=jnp.float32),
        attr_names=tuple(attr_names),
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
    valid = None
    if capacity > n:
        valid = jnp.arange(capacity) < n
    return cloud.take(take, valid)


def _align_attrs(a: PointCloud, b: PointCloud) -> Tuple[PointCloud, PointCloud]:
    """Restrict both clouds to their common descriptor channels (ordered as
    in ``a``) so concatenation is well-defined."""
    if a.attrs is None or b.attrs is None or a.attr_names == b.attr_names:
        if a.attrs is None or b.attrs is None:
            return a.without_attrs(), b.without_attrs()
        return a, b
    common = tuple(k for k in a.attr_names if k in b.attr_names)
    if not common:
        return a.without_attrs(), b.without_attrs()

    def select(c: PointCloud) -> PointCloud:
        cols = [c.attr_names.index(k) for k in common]
        return dataclasses.replace(
            c, attrs=c.attrs[..., jnp.asarray(cols)], attr_names=common)

    return select(a), select(b)


def concatenate(a: PointCloud, b: PointCloud, capacity: Optional[int] = None) -> PointCloud:
    cap = capacity if capacity is not None else a.capacity + b.capacity
    a, b = _align_attrs(a, b)
    merged = PointCloud(
        xyz=jnp.concatenate([a.xyz, b.xyz], axis=0),
        normals=jnp.concatenate([a.normals, b.normals], axis=0),
        mask=jnp.concatenate([a.mask, b.mask], axis=0),
        attrs=None if a.attrs is None
        else jnp.concatenate([a.attrs, b.attrs], axis=0),
        attr_names=a.attr_names,
    )
    return compact(merged, cap)


def to_numpy(cloud: PointCloud):
    """Extract valid points as host numpy arrays (dynamic shape: host-only)."""
    import numpy as np

    mask = np.asarray(cloud.mask)
    xyz = np.asarray(cloud.xyz)[mask]
    normals = np.asarray(cloud.normals)[mask]
    return xyz, normals
