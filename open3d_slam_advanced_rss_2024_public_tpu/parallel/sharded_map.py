"""Spatially sharded voxel map: map blocks partitioned across chips.

The reference bounds per-map growth with submaps and crops patches for
matching (SURVEY.md §5 "spatial scaling").  At pod scale the equivalent is
a map whose *storage and search* are sharded: voxel blocks are assigned to
devices by block hash, fusion runs shard-locally, and correspondence
queries reduce over the mesh with one pmin/psum per query batch — the
framework's answer to BASELINE.json's "map blocks + keyframes partitioned
over hosts, dense multi-session mapping (10^8+ points sharded)".

Layout: every device holds a full-capacity VoxelMap (the open-addressed
table of ops/voxel_map.py) whose voxels are only those belonging to its
blocks (block = voxel cell of size block_size; owner = spatial-hash(block)
mod n_devices).  Total capacity scales linearly with the mesh.  Queries
are replicated; each device answers from its shard and the winners combine
with an argmin-style psum reduction.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import bruteforce, voxel_map
from ..ops.hashgrid import voxel_key, hash_key
from ..utils.pointcloud import PointCloud, SENTINEL
from .mesh import DATA_AXIS

Array = jax.Array


def block_owner(xyz: Array, block_size, n_devices: int) -> Array:
    """Device id owning each point's spatial block."""
    key = voxel_key(xyz, jnp.asarray(block_size, jnp.float32))
    h = hash_key(key, 1 << 20)
    return (h % n_devices).astype(jnp.int32)


def stack_empty_maps(n_devices: int, capacity_per_device: int) -> voxel_map.VoxelMap:
    """A [D, ...]-stacked empty VoxelMap pytree (one table per device)."""
    one = voxel_map.empty(capacity_per_device)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (n_devices,) + x.shape), one)


def local_view(stacked: voxel_map.VoxelMap) -> voxel_map.VoxelMap:
    """Inside shard_map: the device's own table (strip the leading axis 1)."""
    return jax.tree.map(lambda x: x[0], stacked)


def restack(local: voxel_map.VoxelMap) -> voxel_map.VoxelMap:
    return jax.tree.map(lambda x: x[None], local)


def make_sharded_map_ops(mesh: Mesh, capacity_per_device: int,
                         map_voxel_size: float, block_size: float = 8.0):
    """Build (empty_fn, insert_fn, nn_fn, gather_fn) over a fixed mesh.

    insert_fn(stacked_maps, scan)   -> stacked_maps   (scan replicated)
    nn_fn(stacked_maps, queries, mask, max_dist) -> (xyz of match, nrm, d2, found)
    gather_fn(stacked_maps)         -> PointCloud [D*C] (all blocks)
    """
    D = mesh.shape[DATA_AXIS]

    def _insert(maps, scan_xyz, scan_nrm, scan_mask):
        dev = jax.lax.axis_index(DATA_AXIS)
        owner = block_owner(scan_xyz, block_size, D)
        mine = jnp.logical_and(scan_mask, owner == dev)
        scan_local = PointCloud(
            xyz=jnp.where(mine[:, None], scan_xyz, SENTINEL),
            normals=jnp.where(mine[:, None], scan_nrm, 0.0),
            mask=mine,
        )
        vm = voxel_map.insert(local_view(maps), scan_local, map_voxel_size)
        return restack(vm)

    insert_sharded = shard_map(
        _insert, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(), P(), P()),
        out_specs=P(DATA_AXIS),
    )

    @jax.jit
    def insert_fn(maps: voxel_map.VoxelMap, scan: PointCloud) -> voxel_map.VoxelMap:
        return insert_sharded(maps, scan.xyz, scan.normals, scan.mask)

    def _nn(maps, q_xyz, q_mask, max_dist):
        cloud = local_view(maps).cloud
        idx, d2, found = bruteforce.nn(q_xyz, q_mask, cloud.xyz, max_dist[0])
        match_xyz = cloud.xyz[idx]
        match_nrm = cloud.normals[idx]
        d2 = jnp.where(found, d2, jnp.inf)
        # Global winner: min d2 across devices, then broadcast the winning
        # device's match via a masked psum (one collective round).
        best_d2 = jax.lax.pmin(d2, DATA_AXIS)
        am_best = d2 <= best_d2  # ties: multiple devices may claim
        # Deterministic tie-break: lowest device id wins.
        dev = jax.lax.axis_index(DATA_AXIS).astype(jnp.float32)
        claim = jnp.where(am_best, dev, jnp.inf)
        winner = jax.lax.pmin(claim, DATA_AXIS)
        is_winner = (claim == winner)[:, None]
        out_xyz = jax.lax.psum(jnp.where(is_winner, match_xyz, 0.0), DATA_AXIS)
        out_nrm = jax.lax.psum(jnp.where(is_winner, match_nrm, 0.0), DATA_AXIS)
        found_any = jnp.isfinite(best_d2)
        return out_xyz, out_nrm, best_d2, found_any

    nn_sharded = shard_map(
        _nn, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
    )

    @jax.jit
    def nn_fn(maps: voxel_map.VoxelMap, query_xyz: Array, query_mask: Array,
              max_dist):
        return nn_sharded(maps, query_xyz, query_mask,
                          jnp.asarray(max_dist, jnp.float32)[None])

    @jax.jit
    def gather_fn(maps: voxel_map.VoxelMap) -> PointCloud:
        cloud = jax.vmap(lambda m: m.cloud)(maps)
        return PointCloud(
            xyz=cloud.xyz.reshape(-1, 3),
            normals=cloud.normals.reshape(-1, 3),
            mask=cloud.mask.reshape(-1),
        )

    def empty_maps() -> voxel_map.VoxelMap:
        return stack_empty_maps(D, capacity_per_device)

    return empty_maps, insert_fn, nn_fn, gather_fn
