"""Voxel-hash spatial index — the TPU-native replacement for the kd-tree.

The reference finds ICP correspondences with a libnabo kd-tree
(reference: libpointmatcher/pointmatcher/MatchersImpl.cpp:108-133 — build
over reference features, batched kNN query with maxDist) and builds
spatial voxel maps with ``std::unordered_map`` over Eigen::Vector3i keys
(reference: open3d_slam_rsl/.../include/open3d_slam/VoxelHashMap.hpp:25-98).

Tree traversal and pointer-chasing hash maps do not map to TPU.  Instead we
bin points into a power-of-two hash table using sort-based CSR construction
(all static shapes, XLA-fusable):

  build:  voxel key -> hash bucket -> stable argsort by bucket ->
          per-bucket start/count via exclusive cumsum of bincount.
  query:  for each query point, probe the 27 neighboring voxels, gather up
          to ``max_per_bucket`` candidates from each bucket's CSR span, and
          reduce (nearest neighbor / kNN) over the candidate set.

Hash collisions are benign for nearest-neighbor queries: a collision only
adds extra *real* points to the candidate set, which the distance reduction
filters out.  A candidate can only be *missed* if its bucket holds more than
``max_per_bucket`` points, so choose cell_size ≈ query radius and a bucket
budget ≥ the expected max points per voxel after map-resolution
downsampling.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..utils.pointcloud import PointCloud, SENTINEL

Array = jax.Array

# Large primes for 3D spatial hashing (OpenVDB-style, as in the reference's
# EigenVec3iHash — VoxelHashMap.hpp:25-35 — but reduced to a power-of-two
# table with AND masking instead of modulo).
_P1 = jnp.uint32(73856093)
_P2 = jnp.uint32(19349669)
_P3 = jnp.uint32(83492791)


def voxel_key(xyz: Array, cell: Array) -> Array:
    """Quantize positions to int32 voxel coordinates."""
    return jnp.floor(xyz / cell).astype(jnp.int32)


def hash_key(key: Array, table_size: int) -> Array:
    """int32[...,3] voxel coords -> bucket id in [0, table_size)."""
    k = key.astype(jnp.uint32)
    h = (k[..., 0] * _P1) ^ (k[..., 1] * _P2) ^ (k[..., 2] * _P3)
    return (h & jnp.uint32(table_size - 1)).astype(jnp.int32)


def _part1by2(x: Array) -> Array:
    """Spread the low 10 bits of x to every 3rd bit (Morton interleave —
    the standard public bit-dilation constants)."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_code(xyz: Array, mask: Array, cell) -> Array:
    """30-bit Morton (Z-order) code of each point's ``cell``-sized voxel,
    relative to the cloud's valid minimum corner.

    Spatial sort key for the tile-sparse NN kernel (ops/pallas_nn.py):
    consecutive points in Morton order are spatially compact, so per-tile
    AABBs stay tight and most (query-tile, ref-tile) pairs are farther
    apart than the correspondence radius.  Valid range: 1024 cells per
    axis (coords clamp beyond — callers crop first, e.g. 0.5 m cells cover
    512 m).  Invalid lanes sort last (code 2^30).
    """
    key = voxel_key(xyz, jnp.asarray(cell, jnp.float32))
    lo = jnp.min(jnp.where(mask[..., None], key, jnp.int32(2**30)), axis=-2,
                 keepdims=True)
    k = jnp.clip(key - lo, 0, 1023)
    code = ((_part1by2(k[..., 0]) << 2) | (_part1by2(k[..., 1]) << 1)
            | _part1by2(k[..., 2]))
    return jnp.where(mask, code, jnp.int32(1 << 30))


def morton_sort(cloud: PointCloud, cell) -> PointCloud:
    """Reorder a cloud by Morton code (valid points first, spatially
    coherent).  Order is irrelevant to downstream reductions; it only
    improves NN-kernel tile sparsity."""
    code = morton_code(cloud.xyz, cloud.mask, cell)
    return cloud.take(jnp.argsort(code))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HashGrid:
    """CSR-sorted voxel-hash index over a fixed-capacity point set.

    points / normals: f32[N,3] sorted by hash bucket (invalid -> sentinel
                      bucket at the end).
    perm:             int32[N] original index of each sorted slot.
    start / count:    int32[C] CSR span of each bucket in the sorted arrays.
    cell:             f32 scalar — voxel edge length.
    """

    points: Array
    normals: Array
    perm: Array
    start: Array
    count: Array
    cell: Array
    # Optional 1-D descriptor channel per point (same order as ``points``),
    # consumed by GenericDescriptorOutlierFilter (reference
    # OutlierFiltersImpl.h:196-221 — weights from the MATCHED reference
    # point's descriptor).
    desc: "Array | None" = None

    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    @property
    def table_size(self) -> int:
        return self.start.shape[0]


def passthrough(cloud: PointCloud, cell_size, desc_channel: str = None) -> HashGrid:
    """A HashGrid carrying the cloud in its ORIGINAL order with no CSR index.

    For the brute-force / Pallas matchers, which only read points/normals
    and benefit from preserving the voxel-lex spatial order (tile-skipping
    locality); the CSR fields are empty and MUST NOT be queried.
    """
    n = cloud.capacity
    return HashGrid(
        points=cloud.xyz,
        normals=cloud.normals,
        perm=jnp.arange(n, dtype=jnp.int32),
        start=jnp.zeros((1,), jnp.int32),
        count=jnp.zeros((1,), jnp.int32),
        cell=jnp.asarray(cell_size, jnp.float32),
        desc=None if desc_channel is None else cloud.attr(desc_channel),
    )


def build(cloud: PointCloud, cell_size, table_size: int = 1 << 14,
          desc_channel: str = None) -> HashGrid:
    """Build the index. table_size must be a power of two."""
    assert table_size & (table_size - 1) == 0, "table_size must be a power of 2"
    cell = jnp.asarray(cell_size, dtype=jnp.float32)
    key = voxel_key(cloud.xyz, cell)
    bucket = hash_key(key, table_size)
    # Invalid points go to a virtual bucket table_size (sorted to the end,
    # excluded from the CSR table).
    bucket = jnp.where(cloud.mask, bucket, table_size)
    order = jnp.argsort(bucket, stable=True)
    sorted_bucket = bucket[order]
    counts = jnp.bincount(bucket, length=table_size + 1)[:table_size]
    start = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    return HashGrid(
        points=cloud.xyz[order],
        normals=cloud.normals[order],
        perm=order.astype(jnp.int32),
        start=start,
        count=counts.astype(jnp.int32),
        cell=cell,
        desc=None if desc_channel is None else cloud.attr(desc_channel)[order],
    )


# 27-neighborhood offsets, ordered center-first so that with equal distances
# the own-voxel candidate wins deterministically.
_OFFSETS27 = jnp.array(
    sorted(
        [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
        key=lambda o: (abs(o[0]) + abs(o[1]) + abs(o[2])),
    ),
    dtype=jnp.int32,
)


def _candidate_slots(grid: HashGrid, qkey: Array, max_per_bucket: int) -> tuple[Array, Array]:
    """Gather candidate slot indices for each query point.

    qkey: int32[M,3] voxel keys of query points.
    Returns (slots int32[M, 27*K], valid bool[M, 27*K]) — indices into the
    grid's sorted arrays.
    """
    nb_keys = qkey[:, None, :] + _OFFSETS27[None, :, :]  # [M,27,3]
    b = hash_key(nb_keys, grid.table_size)  # [M,27]
    s = grid.start[b]  # [M,27]
    c = jnp.minimum(grid.count[b], max_per_bucket)  # [M,27]
    k = jnp.arange(max_per_bucket, dtype=jnp.int32)
    slots = s[..., None] + k[None, None, :]  # [M,27,K]
    valid = k[None, None, :] < c[..., None]
    slots = jnp.where(valid, slots, 0)
    M = qkey.shape[0]
    return slots.reshape(M, -1), valid.reshape(M, -1)


# Row-block size for chunked queries: bounds the materialized candidate
# tensor to CHUNK x 27K x 3 (a few tens of MB) regardless of query count, so
# large map-sized queries cannot blow HBM.  Chunks run as a sequential
# lax.map; each block is still large enough to saturate the VPU.
_QUERY_CHUNK = 4096


def _chunked_over_rows(core, query_xyz: Array, query_mask: Array):
    """Run ``core(xyz_block, mask_block)`` over row blocks of the queries."""
    m = query_xyz.shape[0]
    if m <= _QUERY_CHUNK:
        return core(query_xyz, query_mask)
    pad = (-m) % _QUERY_CHUNK
    xyz = jnp.pad(query_xyz, ((0, pad), (0, 0)), constant_values=SENTINEL)
    mask = jnp.pad(query_mask, (0, pad))
    n_chunks = xyz.shape[0] // _QUERY_CHUNK
    xyz = xyz.reshape(n_chunks, _QUERY_CHUNK, 3)
    mask = mask.reshape(n_chunks, _QUERY_CHUNK)
    outs = jax.lax.map(lambda args: core(*args), (xyz, mask))
    return jax.tree_util.tree_map(
        lambda o: o.reshape((n_chunks * _QUERY_CHUNK,) + o.shape[2:])[:m], outs)


@partial(jax.jit, static_argnames=("max_per_bucket",))
def query_nn(grid: HashGrid, query_xyz: Array, query_mask: Array, max_dist,
             max_per_bucket: int = 32):
    """Nearest neighbor within max_dist for each query point.

    Returns (index int32[M] into the grid's *sorted* arrays, sq_dist f32[M],
    found bool[M]).  Use grid.points/normals[index] to read the match, or
    grid.perm[index] for the original point id.

    Parity target: libnabo knn=1 maxDist queries
    (reference MatchersImpl.cpp:118-133).  Exact within a voxel budget:
    guaranteed to find the true NN when cell >= max_dist and the NN's bucket
    holds <= max_per_bucket points.
    """

    def core(qxyz, qmask):
        qkey = voxel_key(qxyz, grid.cell)
        slots, valid = _candidate_slots(grid, qkey, max_per_bucket)  # [M, 27K]
        cand = grid.points[slots]  # [M, 27K, 3]
        d2 = jnp.sum((cand - qxyz[:, None, :]) ** 2, axis=-1)
        d2 = jnp.where(valid, d2, jnp.inf)
        best = jnp.argmin(d2, axis=-1)
        best_d2 = jnp.take_along_axis(d2, best[:, None], axis=-1)[:, 0]
        found = jnp.logical_and(qmask, best_d2 <= jnp.asarray(max_dist) ** 2)
        index = jnp.take_along_axis(slots, best[:, None], axis=-1)[:, 0]
        return index, best_d2, found

    return _chunked_over_rows(core, query_xyz, query_mask)


@partial(jax.jit, static_argnames=("k", "max_per_bucket"))
def query_knn(grid: HashGrid, query_xyz: Array, query_mask: Array, max_dist,
              k: int = 8, max_per_bucket: int = 32):
    """k nearest neighbors within max_dist.

    Returns (indices int32[M,k] into sorted arrays, sq_dists f32[M,k],
    valid bool[M,k]).
    """

    def core(qxyz, qmask):
        qkey = voxel_key(qxyz, grid.cell)
        slots, valid = _candidate_slots(grid, qkey, max_per_bucket)
        cand = grid.points[slots]
        d2 = jnp.sum((cand - qxyz[:, None, :]) ** 2, axis=-1)
        d2 = jnp.where(valid, d2, jnp.inf)
        neg_top, top_idx = jax.lax.top_k(-d2, k)  # top_k of negated = k smallest
        kd2 = -neg_top
        kslots = jnp.take_along_axis(slots, top_idx, axis=-1)
        ok = jnp.logical_and(qmask[:, None], kd2 <= jnp.asarray(max_dist) ** 2)
        return kslots, kd2, ok

    return _chunked_over_rows(core, query_xyz, query_mask)


@partial(jax.jit, static_argnames=("max_per_bucket",))
def query_radius_count(grid: HashGrid, query_xyz: Array, query_mask: Array, radius,
                       max_per_bucket: int = 32) -> Array:
    """Number of grid points within ``radius`` of each query point."""

    def core(qxyz, qmask):
        qkey = voxel_key(qxyz, grid.cell)
        slots, valid = _candidate_slots(grid, qkey, max_per_bucket)
        cand = grid.points[slots]
        d2 = jnp.sum((cand - qxyz[:, None, :]) ** 2, axis=-1)
        within = jnp.logical_and(valid, d2 <= jnp.asarray(radius) ** 2)
        return jnp.where(qmask, jnp.sum(within, axis=-1), 0)

    return _chunked_over_rows(core, query_xyz, query_mask)


def occupied_voxel_lookup(grid: HashGrid, query_xyz: Array, query_mask: Array,
                          max_per_bucket: int = 16) -> Array:
    """True when the query point's own voxel contains any grid point.

    Fixed-shape analogue of VoxelMap::hasVoxelContainingPoint
    (reference Voxel.cpp / VoxelHashMap.hpp:104-159) — used for overlap
    computation and space carving.  Exact: bucket candidates are verified
    by voxel key, so hash collisions never produce false positives (a
    bucket holding > max_per_bucket colliding voxels could in principle
    produce a false negative; with power-of-two tables sized ≥ the point
    count that tail is negligible).
    """
    qkey = voxel_key(query_xyz, grid.cell)
    b = hash_key(qkey, grid.table_size)
    offs = jnp.arange(max_per_bucket, dtype=jnp.int32)
    slots = grid.start[b][:, None] + offs[None, :]
    in_bucket = offs[None, :] < grid.count[b][:, None]
    slots = jnp.clip(slots, 0, grid.points.shape[0] - 1)
    ckey = voxel_key(grid.points[slots], grid.cell)
    same_voxel = jnp.all(ckey == qkey[:, None, :], axis=-1)
    hit = jnp.any(jnp.logical_and(in_bucket, same_voxel), axis=-1)
    return jnp.logical_and(query_mask, hit)


def _mix32(h: Array) -> Array:
    """murmur3 finalizer (same decorrelation as ops/voxel_map)."""
    h = h.astype(jnp.uint32)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def occupancy_lookup(ref_xyz: Array, ref_mask: Array, query_xyz: Array,
                     query_mask: Array, cell, table_size: int = 1 << 15) -> Array:
    """True when a query point's ``cell``-voxel contains any reference point
    — the bandwidth-light occupancy test for large clouds.

    Where ``occupied_voxel_lookup`` gathers a [N, max_per_bucket, 3]
    candidate window per query (~50 MB of random HBM traffic at 262k
    lanes, measured ~64 ms on v5e), this packs each reference voxel into
    an exact 30-bit key relative to the reference centroid (the
    ops/voxel_map packing), scatter-mins the keys into a hash table, and
    answers each query with ONE int32 gather + key equality — ~30x less
    traffic.  Two distinct voxels colliding on a slot keep only the
    smaller key (scatter-min), so a colliding voxel can read as
    unoccupied: strictly conservative for overlap restriction, and rare
    when ``table_size`` ≳ 4x the occupied-voxel count.  Queries beyond the
    ±512-cell addressable cube also read unoccupied.
    """
    c = jnp.asarray(cell, jnp.float32)
    rkey = voxel_key(ref_xyz, c)
    nv = jnp.maximum(jnp.sum(ref_mask.astype(jnp.float32)), 1.0)
    centroid = jnp.sum(jnp.where(ref_mask[:, None], ref_xyz, 0.0), axis=0) / nv
    origin = voxel_key(centroid, c)
    EMPTY = jnp.int32(0x7FFFFFFF)

    def pack(key, ok):
        rel = key - origin + 512
        in_range = jnp.logical_and(
            ok, jnp.all(jnp.logical_and(rel >= 0, rel < 1024), axis=-1))
        pk = (rel[..., 0] << 20) | (rel[..., 1] << 10) | rel[..., 2]
        return jnp.where(in_range, pk, EMPTY), in_range

    rpk, r_ok = pack(rkey, ref_mask)
    h = (_mix32(rpk) & jnp.uint32(table_size - 1)).astype(jnp.int32)
    table = jnp.full((table_size,), EMPTY, jnp.int32)
    table = table.at[jnp.where(r_ok, h, table_size)].min(rpk, mode="drop")

    qpk, q_ok = pack(voxel_key(query_xyz, c), query_mask)
    qh = (_mix32(qpk) & jnp.uint32(table_size - 1)).astype(jnp.int32)
    return jnp.logical_and(q_ok, table[qh] == qpk)
