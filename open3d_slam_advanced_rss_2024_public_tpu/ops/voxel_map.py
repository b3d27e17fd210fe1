"""Persistent voxelized point map: an open-addressed voxel hash table.

TPU-native equivalent of the reference's map containers:
  - ``VoxelizedPointCloud`` / ``AggregatedVoxel`` — running mean of
    position/normal/color per voxel (reference: include/open3d_slam/
    Voxel.hpp:19-80, src/Voxel.cpp),
  - ``VoxelHashMap`` — ``unordered_map<Vector3i, Voxel>`` with an
    OpenVDB-style spatial hash (reference VoxelHashMap.hpp:25-98),
  - the Submap's sparse ``mapCloud_`` (reference Submap.cpp:82-96, whose
    full-map re-voxelize per scan is flagged as suboptimal in its own
    comment — the round-2 sort-based insert here had the same flaw:
    3 stable argsorts + top_k over the WHOLE map every scan, 19.6 ms at
    131k capacity on a v5e chip).

Design (round 3): a fixed-capacity open-addressed hash table in HBM.
Slots hold the voxel key (int32[3]) plus weighted sums of position /
normal / descriptor channels.  Insertion is O(scan x probe_rounds):

  1. hash each scan point's voxel key into a slot, linear probing;
  2. resolve slot ownership concurrently with a scatter-min "claim"
     (winner writes its key; same-key losers match it on the next round,
     different-key losers advance their probe);
  3. one scatter-add of the weighted contributions into the table.

This replaces a map-sized sort per scan with ~3 gather/scatter rounds over
the scan only (<0.5 ms) — the same asymptotics as the reference's per-point
``unordered_map`` loop, but batched.  The accumulation is an *exact*
weighted running mean (sums carry weights), identical to the reference's
``AggregatedVoxel::aggregate*``.

Deletion (space carving) uses tombstones: the slot keeps its key so linear
probe chains never break, but its sums/weight reset to zero — a later
observation of the same voxel re-accumulates from scratch.

Capacity: when the table is full (or a probe chain exceeds the round
budget) NEW voxels are dropped and counted in ``dropped`` — bounded growth
is the submap rollover's job (reference point budgets Parameters.hpp:
103-110; SubmapCollection rolls at 95% of capacity).  Size tables ~2x the
expected voxel count to keep probe chains short.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..utils.pointcloud import PointCloud, SENTINEL
from .hashgrid import voxel_key, hash_key

Array = jax.Array

# Probe-round budget per insert.  Expected rounds at load factor <= 0.5 is
# ~2-3; the budget only binds on pathological chains, whose points are
# dropped and counted.
_MAX_ROUNDS = 32


@dataclasses.dataclass(frozen=True)
class VoxelMap:
    """Open-addressed voxel table.  ``cloud`` (the voxel-mean point cloud)
    is a derived view, computed lazily — cheap elementwise math."""

    key_table: Array   # int32[C,3] voxel coords per slot (valid iff occupied)
    occupied: Array    # bool[C] slot has a key (tombstones stay occupied)
    sum_xyz: Array     # f32[C,3] weighted position sums
    sum_nrm: Array     # f32[C,3] weighted normal sums
    weight: Array      # f32[C]   accumulated weights (0 => tombstone/empty)
    cell: Array        # f32 scalar voxel edge length (0 until first insert)
    dropped: Array     # f32 scalar — points lost to capacity/probe overflow
    sum_attrs: "Array | None" = None  # optional f32[C,A] descriptor sums
    attr_names: tuple = ()

    @property
    def capacity(self) -> int:
        return self.key_table.shape[0]

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
    data_fields=("key_table", "occupied", "sum_xyz", "sum_nrm", "weight",
                 "cell", "dropped", "sum_attrs"),
    meta_fields=("attr_names",),
)


def _round_up_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def empty(capacity: int, attr_names: tuple = ()) -> VoxelMap:
    """An empty table with capacity rounded up to a power of two."""
    C = _round_up_pow2(max(capacity, 2))
    return VoxelMap(
        key_table=jnp.zeros((C, 3), jnp.int32),
        occupied=jnp.zeros((C,), bool),
        sum_xyz=jnp.zeros((C, 3), jnp.float32),
        sum_nrm=jnp.zeros((C, 3), jnp.float32),
        weight=jnp.zeros((C,), jnp.float32),
        cell=jnp.float32(0.0),
        dropped=jnp.float32(0.0),
        sum_attrs=(jnp.zeros((C, len(attr_names)), jnp.float32)
                   if attr_names else None),
        attr_names=tuple(attr_names),
    )


def _assign_slots(key_table: Array, occupied: Array, key: Array, mask: Array):
    """Resolve one table slot per scan point (or -1 on overflow).

    Concurrent open-addressing in pure XLA: per round, each still-active
    point probes slot (h0 + probe) & (C-1); empty slots are claimed with a
    scatter-min of the point id (the winner writes its key), matching keys
    assign, and different-key occupants advance the probe.  Same-key claim
    losers re-check the SAME slot next round (the winner's key is there
    now).  Returns (key_table', occupied', assigned int32[S]).
    """
    C = key_table.shape[0]
    S = key.shape[0]
    h0 = hash_key(key, C)
    pid = jnp.arange(S, dtype=jnp.int32)

    def cond(carry):
        _, _, assigned, probe, it = carry
        active = jnp.logical_and(assigned < 0, mask)
        return jnp.logical_and(it < _MAX_ROUNDS, jnp.any(active))

    def body(carry):
        kt, occ, assigned, probe, it = carry
        active = jnp.logical_and(assigned < 0, mask)
        slot = (h0 + probe) & (C - 1)
        s_occ = occ[slot]
        s_key = kt[slot]
        match = jnp.logical_and(s_occ, jnp.all(s_key == key, axis=-1))
        want = jnp.logical_and(active, jnp.logical_not(s_occ))
        # Claim empties: smallest point id wins each slot this round.
        claim_idx = jnp.where(want, slot, C)
        claim = jnp.full((C,), S, jnp.int32).at[claim_idx].min(
            pid, mode="drop")
        won = jnp.logical_and(want, claim[slot] == pid)
        wslot = jnp.where(won, slot, C)
        kt = kt.at[wslot].set(key, mode="drop")
        occ = occ.at[wslot].set(True, mode="drop")
        newly = jnp.logical_and(active, jnp.logical_or(match, won))
        assigned = jnp.where(newly, slot, assigned)
        # Advance only past occupied-with-different-key slots.
        advance = jnp.logical_and(active,
                                  jnp.logical_and(s_occ, jnp.logical_not(match)))
        probe = probe + advance.astype(jnp.int32)
        return kt, occ, assigned, probe, it + 1

    # Derive the initial carry from ``mask`` so its varying-manual-axes type
    # matches the loop body under shard_map (the table is device-varying
    # while fresh constants would be replicated — JAX's vma typing rejects
    # that mix in a while_loop carry).
    vma_zero = jnp.where(mask, jnp.int32(0), jnp.int32(0))
    assigned0 = vma_zero - 1
    probe0 = vma_zero
    kt, occ, assigned, _, _ = jax.lax.while_loop(
        cond, body, (key_table, occupied, assigned0, probe0, jnp.int32(0)))
    return kt, occ, assigned


@jax.jit
def insert(vmap: VoxelMap, scan: PointCloud, voxel_size,
           weights: Array = None) -> VoxelMap:
    """Fuse a scan (already in map frame) into the voxel map.

    Descriptor channels (color/intensity — ≙ AggregatedVoxel::
    aggregateColor, reference Voxel.hpp:19-80) fuse with the same weighted
    running mean as positions; the channel set is adopted from the scan on
    first contact and aligned to common channels afterwards.
    """
    from ..utils import pointcloud as pc

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
    kt, occ, assigned = _assign_slots(vmap.key_table, vmap.occupied, key,
                                      scan.mask)
    idx = jnp.where(assigned >= 0, assigned, C)  # drop overflow
    sum_xyz = vmap.sum_xyz.at[idx].add(scan.xyz * w[:, None], mode="drop")
    sum_nrm = vmap.sum_nrm.at[idx].add(scan.normals * w[:, None], mode="drop")
    weight = vmap.weight.at[idx].add(w, mode="drop")
    if sum_attrs is not None:
        contrib = (scan_attrs * w[:, None] if scan_attrs is not None
                   else jnp.zeros((scan.capacity, sum_attrs.shape[-1]),
                                  jnp.float32))
        sum_attrs = sum_attrs.at[idx].add(contrib, mode="drop")
    n_dropped = jnp.sum(jnp.logical_and(scan.mask, assigned < 0)
                        .astype(jnp.float32))
    return VoxelMap(key_table=kt, occupied=occ, sum_xyz=sum_xyz,
                    sum_nrm=sum_nrm, weight=weight, cell=cell,
                    dropped=vmap.dropped + n_dropped,
                    sum_attrs=sum_attrs, attr_names=attr_names)


@jax.jit
def from_cloud(template: VoxelMap, cloud: PointCloud, weights: Array,
               cell: Array) -> VoxelMap:
    """Rebuild a fresh table (same capacity/channels as ``template``) from a
    weighted point set — used after rigid transforms, which invalidate every
    stored voxel key."""
    fresh = VoxelMap(
        key_table=jnp.zeros_like(template.key_table),
        occupied=jnp.zeros_like(template.occupied),
        sum_xyz=jnp.zeros_like(template.sum_xyz),
        sum_nrm=jnp.zeros_like(template.sum_nrm),
        weight=jnp.zeros_like(template.weight),
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
    pose-graph feedback only)."""
    moved = vmap.cloud.transform(jnp.asarray(T, jnp.float32))
    # Guard the empty map (cell 0 would collapse every key to one voxel).
    cell = jnp.where(vmap.cell > 0, vmap.cell, jnp.float32(1.0))
    return from_cloud(vmap, moved, vmap.weight, cell)


@partial(jax.jit, static_argnames=("steps",))
def carve(vmap: VoxelMap, scan: PointCloud, sensor_origin: Array, carve_voxel_size,
          truncation_distance, max_ray_length, steps: int = 64) -> VoxelMap:
    """Ray-cast space carving: clear map voxels on the free-space segment of
    each scan ray (reference helpers.cpp:238-281 getIdxsOfCarvedPoints,
    Submap::carve Submap.cpp:130-157).

    Fixed-shape formulation: sample ``steps`` points along every valid ray
    between the sensor and (hit distance - truncation); build a hash-grid
    occupancy of the sampled free-space voxels; tombstone map slots whose
    mean falls in a flagged voxel (key kept — probe chains stay intact —
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
    free_cloud = PointCloud(
        xyz=jnp.where(flat_ok[:, None], flat, SENTINEL),
        normals=jnp.zeros_like(flat),
        mask=flat_ok,
    )
    grid = hashgrid.build(free_cloud, carve_voxel_size, table_size=1 << 16)
    means = vmap.cloud
    carved = hashgrid.occupied_voxel_lookup(grid, means.xyz, means.mask)
    keep = jnp.logical_not(carved)[:, None]
    return dataclasses.replace(
        vmap,
        sum_xyz=jnp.where(keep, vmap.sum_xyz, 0.0),
        sum_nrm=jnp.where(keep, vmap.sum_nrm, 0.0),
        weight=jnp.where(keep[:, 0], vmap.weight, 0.0),
        sum_attrs=None if vmap.sum_attrs is None
        else jnp.where(keep, vmap.sum_attrs, 0.0),
    )


@partial(jax.jit, static_argnames=("max_per_bucket",))
def overlap_mask(vmap_grid, other: PointCloud, voxel_size=None, max_per_bucket: int = 32):
    """Mask of ``other``'s points that fall in occupied voxels of a map grid
    (reference helpers.cpp:320-345 computeIndicesOfOverlappingPoints)."""
    from . import hashgrid

    return hashgrid.occupied_voxel_lookup(vmap_grid, other.xyz, other.mask)
