"""Persistent voxelized point map: an open-addressed voxel hash table.

TPU-native equivalent of the reference's map containers:
  - ``VoxelizedPointCloud`` / ``AggregatedVoxel`` — running mean of
    position/normal/color per voxel (reference: include/open3d_slam/
    Voxel.hpp:19-80, src/Voxel.cpp),
  - ``VoxelHashMap`` — ``unordered_map<Vector3i, Voxel>`` with an
    OpenVDB-style spatial hash (reference VoxelHashMap.hpp:25-98),
  - the Submap's sparse ``mapCloud_`` (reference Submap.cpp:82-96).

Design (round 3, v2): a fixed-capacity open-addressed hash table in HBM
keyed by an EXACT 30-bit packed voxel key.

Voxel coordinates are packed relative to a per-map origin (the voxel key
of the first insert's centroid): ``rel = key - origin + 512`` with each
axis in [0, 1024), i.e. a 102.4 m cube at 0.1 m cells — far beyond any
single submap's extent (the reference crops match patches at <= 30 m and
rolls submaps long before that; Parameters.hpp:103-110).  Points outside
the addressable cube are dropped and counted in ``dropped``.

Because the packed key is *bijective* on the addressable cube, the table
needs only ONE int32 per slot: the packed key itself, with INT32_MAX as
the empty sentinel.  Insertion resolves slots with windowed probing:

  1. gather a window of 8 consecutive slots per point (one [S,8] gather);
  2. first slot holding the point's key -> assigned (covers same-key
     duplicates in the same round);
  3. else claim the first EMPTY slot by scattering ``min(packed_key)``
     into it — concurrent claimants of one slot resolve to a single
     winner, losers advance and retry;
  4. repeat until every point is assigned (expected 1-2 rounds at load
     factor <= 0.5: the window covers probe displacements 0-7 at once).

Cost per insert: ~2 windowed gathers + ~2 single-lane scatters over the
SCAN (never the map) plus one fused scatter-add of the accumulator rows —
measured ~8x faster than the round-2 per-point claim loop (PROFILE.md).

Accumulation is an *exact* weighted running mean (sums carry weights),
identical to the reference's ``AggregatedVoxel::aggregate*``; sums live in
a single f32[C,8] accumulator (sum_xyz | sum_normal | weight | pad) so
fusion is ONE scatter-add.

Deletion (space carving) uses tombstones: the slot keeps its key so probe
windows never miss, but its sums/weight reset to zero — a later
observation of the same voxel re-accumulates from scratch.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..utils.pointcloud import PointCloud, SENTINEL
from .hashgrid import voxel_key

Array = jax.Array

_EMPTY = jnp.int32(0x7FFFFFFF)  # > any 30-bit packed key
_WINDOW = 8                      # probe slots examined per round
_MAX_ROUNDS = 16                 # round budget (binds only on full tables)
_HALF = 512                      # packing bias: rel coords in [0, 1024)


@dataclasses.dataclass(frozen=True)
class VoxelMap:
    """Open-addressed voxel table.  ``cloud`` (the voxel-mean point cloud)
    is a derived view, computed lazily — cheap elementwise math."""

    ptable: Array   # int32[C] packed voxel key per slot (_EMPTY = free)
    origin: Array   # int32[3] packing origin (voxel coords)
    acc: Array      # f32[C,8] = sum_xyz[3] | sum_normal[3] | weight | pad
    cell: Array     # f32 scalar voxel edge length (0 until first insert)
    dropped: Array  # f32 scalar — points lost to capacity/range overflow
    sum_attrs: "Array | None" = None  # optional f32[C,A] descriptor sums
    attr_names: tuple = ()

    @property
    def capacity(self) -> int:
        return self.ptable.shape[-1]

    @property
    def occupied(self) -> Array:
        return self.ptable != _EMPTY

    @property
    def sum_xyz(self) -> Array:
        return self.acc[..., 0:3]

    @property
    def sum_nrm(self) -> Array:
        return self.acc[..., 3:6]

    @property
    def weight(self) -> Array:
        return self.acc[..., 6]

    def count(self) -> Array:
        return jnp.sum(jnp.logical_and(self.occupied, self.weight > 0.0)
                       .astype(jnp.int32))

    @property
    def cloud(self) -> PointCloud:
        """Voxel means as a fixed-capacity masked PointCloud (derived view,
        ≙ VoxelizedPointCloud::toPointCloud, Voxel.cpp)."""
        m = jnp.logical_and(self.occupied, self.weight > 0.0)
        denom = jnp.maximum(self.weight, 1e-9)[..., None]
        xyz = jnp.where(m[..., None], self.sum_xyz / denom, SENTINEL)
        nrm = self.sum_nrm / denom
        nlen = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
        nrm = jnp.where(jnp.logical_and(m[..., None], nlen > 1e-6),
                        nrm / (nlen + 1e-12), 0.0)
        attrs = None
        if self.sum_attrs is not None:
            attrs = jnp.where(m[..., None], self.sum_attrs / denom, 0.0)
        return PointCloud(xyz=xyz, normals=nrm, mask=m, attrs=attrs,
                          attr_names=self.attr_names)


jax.tree_util.register_dataclass(
    VoxelMap,
    data_fields=("ptable", "origin", "acc", "cell", "dropped", "sum_attrs"),
    meta_fields=("attr_names",),
)


def _round_up_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


@partial(jax.jit, static_argnames=("capacity", "attr_names"))
def empty(capacity: int, attr_names: tuple = ()) -> VoxelMap:
    """An empty table with capacity rounded up to a power of two.

    jitted so the table's buffers materialize on device as program
    outputs (the host-side fill lands once)."""
    C = _round_up_pow2(max(capacity, 2))
    return VoxelMap(
        ptable=jnp.full((C,), _EMPTY, jnp.int32),
        origin=jnp.zeros((3,), jnp.int32),
        acc=jnp.zeros((C, 8), jnp.float32),
        cell=jnp.float32(0.0),
        dropped=jnp.float32(0.0),
        sum_attrs=(jnp.zeros((C, len(attr_names)), jnp.float32)
                   if attr_names else None),
        attr_names=tuple(attr_names),
    )


def _mix32(h: Array) -> Array:
    """murmur3 finalizer — decorrelates the spatially structured packed
    keys before slot assignment."""
    h = h.astype(jnp.uint32)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _pack_keys(key: Array, origin: Array, ok: Array):
    """int32[...,3] voxel coords -> (packed int32[...], in_range bool[...])."""
    rel = key - origin + _HALF
    in_range = jnp.logical_and(
        ok, jnp.all(jnp.logical_and(rel >= 0, rel < 2 * _HALF), axis=-1))
    pk = (rel[..., 0] << 20) | (rel[..., 1] << 10) | rel[..., 2]
    return jnp.where(in_range, pk, _EMPTY), in_range


def _assign_slots(ptable: Array, pk: Array, ok: Array):
    """Resolve one table slot per scan point (or -1 on overflow).

    Windowed concurrent open-addressing in pure XLA: per round, each
    still-active point gathers ``_WINDOW`` consecutive slots, takes the
    first slot already holding its key, else scatter-min-claims the first
    empty slot (the smallest packed key wins each contested slot; losers
    advance past the now-taken slot).  Same-key duplicates resolve in the
    winner's round.  Claims only ever target slots observed EMPTY this
    round, so an occupied slot is never overwritten.
    """
    C = ptable.shape[0]
    h0 = (_mix32(pk) & jnp.uint32(C - 1)).astype(jnp.int32)
    span = jnp.arange(_WINDOW, dtype=jnp.int32)

    # Derive the initial carry from ``ok`` so its varying-manual-axes type
    # matches the loop body under shard_map (the table is device-varying
    # while fresh constants would be replicated — JAX's vma typing rejects
    # that mix in a while_loop carry).
    vz = jnp.where(ok, jnp.int32(0), jnp.int32(0))
    assigned0 = vz - 1
    base0 = h0 + vz

    def cond(carry):
        _, assigned, _, it = carry
        return jnp.logical_and(it < _MAX_ROUNDS,
                               jnp.any(jnp.logical_and(assigned < 0, ok)))

    def body(carry):
        pt, assigned, base, it = carry
        active = jnp.logical_and(assigned < 0, ok)
        idx = (base[:, None] + span[None, :]) & (C - 1)     # [S,W]
        win = pt[idx]                                        # [S,W] gather
        is_mine = win == pk[:, None]
        is_empty = win == _EMPTY
        any_mine = jnp.any(is_mine, axis=-1)
        mine_j = jnp.argmax(is_mine, axis=-1)
        any_empty = jnp.any(is_empty, axis=-1)
        empty_j = jnp.argmax(is_empty, axis=-1)
        lane = jnp.arange(pk.shape[0])
        mine_slot = idx[lane, mine_j]
        claim_slot = idx[lane, empty_j]
        assigned = jnp.where(jnp.logical_and(active, any_mine), mine_slot,
                             assigned)
        want = jnp.logical_and(active,
                               jnp.logical_and(jnp.logical_not(any_mine),
                                               any_empty))
        pt = pt.at[jnp.where(want, claim_slot, C)].min(pk, mode="drop")
        got = jnp.logical_and(want, pt[claim_slot] == pk)
        assigned = jnp.where(got, claim_slot, assigned)
        # Advance: claim losers restart at the (now occupied) empty slot;
        # windows with no empty and no match skip the whole window.
        lost = jnp.logical_and(want, jnp.logical_not(got))
        stuck = jnp.logical_and(active,
                                jnp.logical_and(jnp.logical_not(any_mine),
                                                jnp.logical_not(any_empty)))
        base = jnp.where(lost, base + empty_j,
                         jnp.where(stuck, base + _WINDOW, base))
        return pt, assigned, base, it + 1

    pt, assigned, _, _ = jax.lax.while_loop(
        cond, body, (ptable, assigned0, base0, jnp.int32(0)))
    return pt, assigned


@jax.jit
def insert(vmap: VoxelMap, scan: PointCloud, voxel_size,
           weights: Array = None) -> VoxelMap:
    """Fuse a scan (already in map frame) into the voxel map.

    Descriptor channels (color/intensity — ≙ AggregatedVoxel::
    aggregateColor, reference Voxel.hpp:19-80) fuse with the same weighted
    running mean as positions; the channel set is adopted from the scan on
    first contact and aligned to common channels afterwards.
    """
    C = vmap.capacity
    cell = jnp.asarray(voxel_size, jnp.float32)
    sum_attrs = vmap.sum_attrs
    attr_names = vmap.attr_names
    if sum_attrs is None and scan.attrs is not None:
        sum_attrs = jnp.zeros((C, scan.attrs.shape[-1]), jnp.float32)
        attr_names = scan.attr_names
    scan_attrs = None
    if sum_attrs is not None and scan.attrs is not None:
        # Align the scan's channels to the map's channel order.
        if tuple(scan.attr_names) == tuple(attr_names):
            scan_attrs = scan.attrs
        else:
            cols = [scan.attr_names.index(k) for k in attr_names
                    if k in scan.attr_names]
            if len(cols) == len(attr_names):
                scan_attrs = scan.attrs[:, jnp.asarray(cols)]
    w = jnp.ones((scan.capacity,), jnp.float32) if weights is None else (
        jnp.asarray(weights, jnp.float32))
    w = jnp.where(scan.mask, w, 0.0)

    key = voxel_key(scan.xyz, cell)
    # Packing origin: adopted from the first insert's valid centroid.
    has_origin = jnp.any(vmap.occupied)
    nv = jnp.maximum(jnp.sum(scan.mask.astype(jnp.float32)), 1.0)
    centroid = jnp.sum(jnp.where(scan.mask[:, None], scan.xyz, 0.0),
                       axis=0) / nv
    origin = jnp.where(has_origin, vmap.origin,
                       voxel_key(centroid, cell))
    pk, ok = _pack_keys(key, origin, scan.mask)
    pt, assigned = _assign_slots(vmap.ptable, pk, ok)
    idx = jnp.where(assigned >= 0, assigned, C)  # drop overflow
    contrib = jnp.concatenate(
        [scan.xyz * w[:, None], scan.normals * w[:, None], w[:, None],
         jnp.zeros((scan.capacity, 1), jnp.float32)], axis=-1)
    acc = vmap.acc.at[idx].add(contrib, mode="drop")
    if sum_attrs is not None:
        a = (scan_attrs * w[:, None] if scan_attrs is not None
             else jnp.zeros((scan.capacity, sum_attrs.shape[-1]), jnp.float32))
        sum_attrs = sum_attrs.at[idx].add(a, mode="drop")
    n_dropped = jnp.sum(jnp.logical_and(scan.mask, assigned < 0)
                        .astype(jnp.float32))
    return VoxelMap(ptable=pt, origin=origin, acc=acc, cell=cell,
                    dropped=vmap.dropped + n_dropped,
                    sum_attrs=sum_attrs, attr_names=attr_names)


@jax.jit
def from_cloud(template: VoxelMap, cloud: PointCloud, weights: Array,
               cell: Array) -> VoxelMap:
    """Rebuild a fresh table (same capacity/channels as ``template``) from a
    weighted point set — used after rigid transforms, which invalidate every
    stored voxel key."""
    fresh = VoxelMap(
        ptable=jnp.full_like(template.ptable, _EMPTY),
        origin=jnp.zeros_like(template.origin),
        acc=jnp.zeros_like(template.acc),
        cell=cell,
        dropped=jnp.float32(0.0),
        sum_attrs=None if template.sum_attrs is None
        else jnp.zeros_like(template.sum_attrs),
        attr_names=template.attr_names,
    )
    return insert(fresh, cloud, cell, weights=weights)


@jax.jit
def transform(vmap: VoxelMap, T: Array) -> VoxelMap:
    """Rigidly move the whole map (loop-closure feedback onto submaps,
    reference Submap::transform, Submap.cpp:115-128).  Voxel keys change
    under the motion, so the table is rebuilt by re-inserting the
    transformed voxel means with their accumulated weights (rare event:
    pose-graph feedback only).  The packing origin re-derives from the
    moved cloud."""
    moved = vmap.cloud.transform(jnp.asarray(T, jnp.float32))
    # Guard the empty map (cell 0 would collapse every key to one voxel).
    cell = jnp.where(vmap.cell > 0, vmap.cell, jnp.float32(1.0))
    return from_cloud(vmap, moved, vmap.weight, cell)


@jax.jit
def transform_content(vmap: VoxelMap, T: Array) -> VoxelMap:
    """Rigidly move the map's CONTENT (accumulated sums) without re-keying
    the table — elementwise over the accumulator vs a full table rebuild
    (~1 ms vs ~30 ms at 262k slots on v5e).

    After this, ``cloud`` (the value view) is correct in the new frame but
    the stored voxel KEYS are stale: further ``insert``/``carve`` into
    this table would bin by the old geometry.  Use for CLOSED submaps on
    pose-graph feedback (they receive no inserts), with ``rekey`` run
    lazily if the submap is ever re-activated (models/submap.py
    ensure_keys)."""
    Tj = jnp.asarray(T, jnp.float32)
    R, t = Tj[:3, :3], Tj[:3, 3]
    w = vmap.weight[..., None]
    new_sxyz = vmap.sum_xyz @ R.T + t * w
    new_snrm = vmap.sum_nrm @ R.T
    acc = vmap.acc.at[..., 0:3].set(new_sxyz).at[..., 3:6].set(new_snrm)
    return dataclasses.replace(vmap, acc=acc)


@jax.jit
def rekey(vmap: VoxelMap) -> VoxelMap:
    """Rebuild the table's keys from the current voxel means (after
    transform_content): re-inserts the means with their weights, restoring
    insert/carve validity.  Preserves the cumulative drop counter."""
    cell = jnp.where(vmap.cell > 0, vmap.cell, jnp.float32(1.0))
    out = from_cloud(vmap, vmap.cloud, vmap.weight, cell)
    return dataclasses.replace(out, dropped=vmap.dropped)


@partial(jax.jit, static_argnames=("keep_fraction",))
def evict_low_weight(vmap: VoxelMap, keep_fraction: float = 0.75) -> VoxelMap:
    """Overflow policy: keep the ``keep_fraction`` highest-weight voxels
    and rebuild the table (ADVICE r3 / VERDICT r3 #6 — replace silent
    drops with an explicit, observable eviction).

    Weight = accumulated observation count, so eviction removes the
    least-corroborated voxels first (single-hit speckle, transients) —
    the natural confidence order for a fused map.  The primary capacity
    bound in the SLAM path remains the submap point-budget rollover
    (≙ maxNumPoints_, SubmapCollection.cpp:114-116); this op serves
    single-map drivers (localization, bench, sharded blocks) where no
    rollover exists.  The host triggers it when ``dropped`` goes nonzero
    (see Mapper flush / MapperStats.map_voxels_dropped).
    """
    C = vmap.capacity
    keep_n = max(int(C * keep_fraction), 1)
    w = jnp.where(jnp.logical_and(vmap.occupied, vmap.weight > 0.0),
                  vmap.weight, -1.0)
    # Rank voxels by weight; survivors keep their exact accumulated sums.
    order = jnp.argsort(-w)
    keep = jnp.zeros((C,), bool).at[order[:keep_n]].set(True)
    keep = jnp.logical_and(keep, w > 0.0)
    cloud = vmap.cloud
    survivors = PointCloud(
        xyz=jnp.where(keep[:, None], cloud.xyz, SENTINEL),
        normals=cloud.normals,
        mask=keep,
        attrs=cloud.attrs,
        attr_names=cloud.attr_names,
    )
    cell = jnp.where(vmap.cell > 0, vmap.cell, jnp.float32(1.0))
    out = from_cloud(vmap, survivors, jnp.where(keep, vmap.weight, 0.0), cell)
    # Preserve the cumulative drop counter (observability), and the origin
    # (survivor keys were valid under it; from_cloud re-derives an origin
    # from the survivor centroid which stays within the same cube).
    return dataclasses.replace(out, dropped=vmap.dropped)


@partial(jax.jit, static_argnames=("keep_fraction",))
def evict_far(vmap: VoxelMap, center: Array,
              keep_fraction: float = 0.75) -> VoxelMap:
    """Overflow policy: keep the ``keep_fraction`` voxels NEAREST to
    ``center`` (the current sensor pose) and rebuild the table.

    The alternative to evict_low_weight, evaluated for the frontier-bias
    concern (weight-keyed eviction drops the newest, least-corroborated
    voxels, which are near the robot).  Measured ATE under sustained
    overflow (tests/test_voxel_map.py::test_overflow_eviction_policy_ate,
    3 seeds): weight-keyed is consistently BETTER (0.047-0.082 m vs
    0.072-0.089 m) — the high-weight voxels' averaged-down noise anchors
    ICP more than recency helps — so "weight" stays the default and this
    policy is available via overflow_evict_policy="distance".
    """
    C = vmap.capacity
    keep_n = max(int(C * keep_fraction), 1)
    occ = jnp.logical_and(vmap.occupied, vmap.weight > 0.0)
    mean = vmap.sum_xyz / jnp.maximum(vmap.weight, 1e-9)[..., None]
    d2 = jnp.sum((mean - jnp.asarray(center, jnp.float32)) ** 2, axis=-1)
    d2 = jnp.where(occ, d2, jnp.inf)
    order = jnp.argsort(d2)
    keep = jnp.zeros((C,), bool).at[order[:keep_n]].set(True)
    keep = jnp.logical_and(keep, occ)
    cloud = vmap.cloud
    survivors = PointCloud(
        xyz=jnp.where(keep[:, None], cloud.xyz, SENTINEL),
        normals=cloud.normals,
        mask=keep,
        attrs=cloud.attrs,
        attr_names=cloud.attr_names,
    )
    cell = jnp.where(vmap.cell > 0, vmap.cell, jnp.float32(1.0))
    out = from_cloud(vmap, survivors, jnp.where(keep, vmap.weight, 0.0), cell)
    return dataclasses.replace(out, dropped=vmap.dropped)


@partial(jax.jit, static_argnames=("steps",))
def carve(vmap: VoxelMap, scan: PointCloud, sensor_origin: Array, carve_voxel_size,
          truncation_distance, max_ray_length, steps: int = 64) -> VoxelMap:
    """Ray-cast space carving: clear map voxels on the free-space segment of
    each scan ray (reference helpers.cpp:238-281 getIdxsOfCarvedPoints,
    Submap::carve Submap.cpp:130-157).

    Fixed-shape formulation: sample ``steps`` points along every valid ray
    between the sensor and (hit distance - truncation); build a hash-grid
    occupancy of the sampled free-space voxels; tombstone map slots whose
    mean falls in a flagged voxel (key kept — probe windows stay intact —
    sums zeroed so the voxel re-accumulates if re-observed).
    """
    from . import hashgrid

    origin = jnp.asarray(sensor_origin, jnp.float32)
    ray = jnp.where(scan.mask[:, None], scan.xyz - origin, 0.0)
    hit_dist = jnp.linalg.norm(ray, axis=-1, keepdims=True)  # [N,1]
    direction = ray / jnp.maximum(hit_dist, 1e-9)
    free_len = jnp.minimum(hit_dist - truncation_distance, max_ray_length)  # [N,1]
    # steps samples in (0, free_len): fractions (i+0.5)/steps.
    frac = (jnp.arange(steps, dtype=jnp.float32) + 0.5) / steps
    sample_d = frac[None, :, None] * free_len[:, None, :]  # [N, S, 1]
    samples = origin + direction[:, None, :] * sample_d  # [N, S, 3]
    sample_ok = jnp.logical_and(scan.mask[:, None],
                                jnp.broadcast_to(free_len > 0, (scan.capacity, steps)))
    flat = samples.reshape(-1, 3)
    flat_ok = sample_ok.reshape(-1)
    means = vmap.cloud
    # Occupancy-table test (packed-key scatter + one gather) instead of a
    # CSR build over the steps*N sampled lanes — the sort alone over ~0.5M
    # free-space samples dominated the carve.
    carved = hashgrid.occupancy_lookup(flat, flat_ok, means.xyz, means.mask,
                                       carve_voxel_size, table_size=1 << 16)
    keep = jnp.logical_not(carved)[:, None]
    return dataclasses.replace(
        vmap,
        acc=jnp.where(keep, vmap.acc, 0.0),
        sum_attrs=None if vmap.sum_attrs is None
        else jnp.where(keep, vmap.sum_attrs, 0.0),
    )


@partial(jax.jit, static_argnames=("max_per_bucket",))
def overlap_mask(vmap_grid, other: PointCloud, voxel_size=None, max_per_bucket: int = 32):
    """Mask of ``other``'s points that fall in occupied voxels of a map grid
    (reference helpers.cpp:320-345 computeIndicesOfOverlappingPoints)."""
    from . import hashgrid

    return hashgrid.occupied_voxel_lookup(vmap_grid, other.xyz, other.mask)
