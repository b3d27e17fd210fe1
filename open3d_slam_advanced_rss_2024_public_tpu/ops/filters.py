"""Point-cloud filters as jit-compiled fixed-shape array transforms.

TPU-native equivalents of the DataPointsFilters the reference registers and
the Open3D preprocessing the SLAM core calls:
  - voxel down-sampling with in-voxel averaging
    (reference helpers.cpp:117-192 voxelizeWithinCroppingVolume, and
    libpointmatcher VoxelGridDataPointsFilter),
  - random sampling / max point count
    (libpointmatcher RandomSamplingDataPointsFilter,
    MaxPointCountDataPointsFilter; used in Odometry.cpp:22-27),
  - non-finite removal (helpers.cpp:404 removePointsWithNonFiniteValues,
    RemoveNaNDataPointsFilter),
  - distance / bounding-box limits (MaxDist/MinDist/BoundingBox/
    DistanceLimit DataPointsFilters, Registry.cpp:67-95).

All filters preserve capacity; "removal" = masking.  Down-sampling returns a
new fixed-capacity compacted cloud.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.pointcloud import PointCloud, SENTINEL, compact
from .hashgrid import voxel_key

Array = jax.Array


def remove_non_finite(cloud: PointCloud) -> PointCloud:
    ok = jnp.all(jnp.isfinite(cloud.xyz), axis=-1)
    return cloud.with_mask(ok)


def distance_limit(cloud: PointCloud, min_dist=0.0, max_dist=jnp.inf) -> PointCloud:
    r = jnp.linalg.norm(jnp.where(cloud.mask[:, None], cloud.xyz, 0.0), axis=-1)
    return cloud.with_mask((r >= min_dist) & (r <= max_dist))


def bounding_box(cloud: PointCloud, lo, hi, invert: bool = False) -> PointCloud:
    lo = jnp.asarray(lo, dtype=jnp.float32)
    hi = jnp.asarray(hi, dtype=jnp.float32)
    inside = jnp.all((cloud.xyz >= lo) & (cloud.xyz <= hi), axis=-1)
    return cloud.with_mask(jnp.logical_not(inside) if invert else inside)


def random_sampling(cloud: PointCloud, key, prob: float) -> PointCloud:
    """Keep each valid point independently with probability ``prob``."""
    u = jax.random.uniform(key, (cloud.capacity,))
    return cloud.with_mask(u < prob)


def max_point_count(cloud: PointCloud, key, max_count: int) -> PointCloud:
    """Random subsample down to at most ``max_count`` valid points.

    (reference MaxPointCountDataPointsFilter semantics: random, not
    truncation — keeps the spatial distribution unbiased.)
    """
    u = jax.random.uniform(key, (cloud.capacity,))
    priority = jnp.where(cloud.mask, u, jnp.inf)
    order = jnp.argsort(priority)
    keep = jnp.zeros((cloud.capacity,), dtype=bool).at[order[:max_count]].set(True)
    return cloud.with_mask(keep)


def _lex_sort_by_voxel(cloud: PointCloud, vkey: Array):
    """Stable lexicographic sort of the cloud by voxel key (exact grouping,
    no hash collisions).  Three stable counting-style argsorts."""
    order = jnp.arange(cloud.capacity, dtype=jnp.int32)
    for axis in (2, 1, 0):
        o = jnp.argsort(vkey[order, axis], stable=True)
        order = order[o]
    return order


@partial(jax.jit, static_argnames=("capacity", "order"))
def voxel_downsample(cloud: PointCloud, voxel_size, capacity: int,
                     order: str = "lex") -> PointCloud:
    """Voxel-grid down-sampling with per-voxel averaging of position+normal.

    Exact (lexicographic grouping, not hashed).  Output is compacted to
    ``capacity`` valid-first; if more voxels are occupied than ``capacity``
    the overflow is dropped (callers size capacity for their map budget,
    mirroring the reference's submap point budgets Parameters.hpp:103-110).

    ``order="morton"``: group AND sort by the 30-bit Morton code of the
    voxel in ONE argsort instead of three — and the output comes out in
    Z-order, so the tile-sparse NN kernel needs no separate spatial sort.
    Exact only while the cloud spans < 1024 voxels per axis (102 m at
    0.1 m cells); use on radius-cropped scans (the pipeline crops first).
    """
    n = cloud.capacity
    vkey = voxel_key(cloud.xyz, jnp.asarray(voxel_size, jnp.float32))
    # Push invalid points to a sentinel key so they sort last and group once.
    big = jnp.int32(2**30)
    vkey = jnp.where(cloud.mask[:, None], vkey, big)
    if order == "morton":
        from .hashgrid import _part1by2

        # Hierarchical Z-order key (ADVICE r3): a single 30-bit Morton code
        # aliases distinct voxels once the cloud spans >= 1024 cells per
        # axis (aliased voxels interleave in the sort and emit duplicate
        # split voxels).  Split the relative cell coords into low 10 bits
        # (fine Morton) and high bits (coarse Morton) and sort coarse-major
        # — exact up to 2^20 cells per axis.  The coarse pass is a lax.cond
        # so the common radius-cropped case pays ONE argsort.
        lo_corner = jnp.min(jnp.where(cloud.mask[:, None], vkey, big), axis=0,
                            keepdims=True)
        k = jnp.where(cloud.mask[:, None], vkey - lo_corner, 0)
        k_lo, k_hi = k & 1023, jnp.clip(k >> 10, 0, 1023)
        inval = jnp.int32(1 << 30)

        def z(c):
            return (_part1by2(c[:, 0]) << 2) | (_part1by2(c[:, 1]) << 1) | \
                _part1by2(c[:, 2])

        code_lo = jnp.where(cloud.mask, z(k_lo), inval)
        code_hi = jnp.where(cloud.mask, z(k_hi), inval)
        o1 = jnp.argsort(code_lo, stable=True)
        span_ok = jnp.max(jnp.where(cloud.mask[:, None], k, 0)) < 1024
        order_idx = jax.lax.cond(
            span_ok, lambda o: o,
            lambda o: o[jnp.argsort(code_hi[o], stable=True)], o1)
        sk = jnp.where(cloud.mask[order_idx, None], vkey[order_idx], big)
    else:
        order_idx = _lex_sort_by_voxel(cloud, vkey)
        sk = vkey[order_idx]
    order = order_idx
    sxyz = cloud.xyz[order]
    snrm = cloud.normals[order]
    smask = cloud.mask[order]
    new_seg = jnp.any(sk != jnp.roll(sk, 1, axis=0), axis=-1)
    new_seg = new_seg.at[0].set(True)
    seg = jnp.cumsum(new_seg.astype(jnp.int32)) - 1  # [N] segment ids
    w = smask.astype(jnp.float32)
    cnt = jax.ops.segment_sum(w, seg, num_segments=n)
    sum_xyz = jax.ops.segment_sum(sxyz * w[:, None], seg, num_segments=n)
    sum_nrm = jax.ops.segment_sum(snrm * w[:, None], seg, num_segments=n)
    denom = jnp.maximum(cnt, 1.0)[:, None]
    mean_xyz = sum_xyz / denom
    mean_nrm = sum_nrm / denom
    nrm_len = jnp.linalg.norm(mean_nrm, axis=-1, keepdims=True)
    mean_nrm = jnp.where(nrm_len > 1e-6, mean_nrm / (nrm_len + 1e-12), 0.0)
    seg_valid = cnt > 0
    mean_attrs = None
    if cloud.attrs is not None:
        sum_attrs = jax.ops.segment_sum(cloud.attrs[order] * w[:, None], seg,
                                        num_segments=n)
        mean_attrs = jnp.where(seg_valid[:, None], sum_attrs / denom, 0.0)
    out = PointCloud(
        xyz=jnp.where(seg_valid[:, None], mean_xyz, SENTINEL),
        normals=jnp.where(seg_valid[:, None], mean_nrm, 0.0),
        mask=seg_valid,
        attrs=mean_attrs,
        attr_names=cloud.attr_names if mean_attrs is not None else (),
    )
    return compact(out, capacity)


@partial(jax.jit, static_argnames=("capacity",))
def voxel_downsample_within_volume(cloud: PointCloud, voxel_size, volume_mask: Array,
                                   capacity: int) -> PointCloud:
    """Voxelize only points inside ``volume_mask``; drop the rest.

    Matches voxelizeWithinCroppingVolume (reference helpers.cpp:117-192):
    the reference voxelizes the part of the cloud inside the cropping volume
    and discards the outside.
    """
    inside = cloud.with_mask(volume_mask)
    return voxel_downsample(inside, voxel_size, capacity)


def remove_duplicate_points_in_voxels(cloud: PointCloud, voxel_size) -> PointCloud:
    """Keep only the first valid point of each occupied voxel (mask-only).

    Equivalent of removeDuplicatePointsWithinSameVoxels (reference
    Voxel.cpp) — cheaper than full averaging when dedup is all that is
    needed.
    """
    n = cloud.capacity
    vkey = voxel_key(cloud.xyz, jnp.asarray(voxel_size, jnp.float32))
    big = jnp.int32(2**30)
    vkey = jnp.where(cloud.mask[:, None], vkey, big)
    order = _lex_sort_by_voxel(cloud, vkey)
    sk = vkey[order]
    first = jnp.any(sk != jnp.roll(sk, 1, axis=0), axis=-1).at[0].set(True)
    keep_sorted = jnp.zeros((n,), bool).at[order].set(first)
    return cloud.with_mask(keep_sorted)
