"""Spatially sharded voxel map: map blocks partitioned across chips.

The reference bounds per-map growth with submaps and crops patches for
matching (SURVEY.md §5 "spatial scaling").  At pod scale the equivalent is
a map whose *storage and search* are sharded: voxel blocks are assigned to
devices by block hash, fusion runs shard-locally, and correspondence
queries reduce over the mesh with one pmin/psum per query batch — the
framework's answer to BASELINE.json's "map blocks + keyframes partitioned
over hosts, dense multi-session mapping (10^8+ points sharded)".

Layout: every device holds a full-capacity VoxelMap whose points are only
those belonging to its blocks (block = voxel cell of size block_size;
owner = spatial-hash(block) mod n_devices).  Total capacity scales
linearly with the mesh.  Queries are replicated; each device answers from
its shard and the winners combine with an argmin-style psum reduction.
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


def make_sharded_map_ops(mesh: Mesh, capacity_per_device: int,
                         map_voxel_size: float, block_size: float = 8.0):
    """Build (insert_fn, nn_fn, gather_fn) over a fixed mesh.

    insert_fn(stacked_maps, scan)   -> stacked_maps   (scan replicated)
    nn_fn(stacked_maps, queries, mask, max_dist) -> (xyz of match, d2, found)
    gather_fn(stacked_maps)         -> PointCloud [D*C] (all blocks)

    ``stacked_maps`` is a VoxelMap pytree whose leading axis D is sharded
    over the mesh (one shard per device).
    """
    D = mesh.shape[DATA_AXIS]

    def _insert(local_map_cloudxyz, local_nrm, local_mask, local_w,
                scan_xyz, scan_nrm, scan_mask):
        dev = jax.lax.axis_index(DATA_AXIS)
        owner = block_owner(scan_xyz[0], block_size, D)
        mine = jnp.logical_and(scan_mask[0], owner == dev)
        scan_local = PointCloud(
            xyz=jnp.where(mine[:, None], scan_xyz[0], SENTINEL),
            normals=jnp.where(mine[:, None], scan_nrm[0], 0.0),
            mask=mine,
        )
        vm = voxel_map.VoxelMap(
            cloud=PointCloud(xyz=local_map_cloudxyz[0], normals=local_nrm[0],
                             mask=local_mask[0]),
            weight=local_w[0],
        )
        vm = voxel_map.insert(vm, scan_local, map_voxel_size)
        return (vm.cloud.xyz[None], vm.cloud.normals[None],
                vm.cloud.mask[None], vm.weight[None])

    insert_sharded = shard_map(
        _insert, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                  P(), P(), P()),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
    )

    @jax.jit
    def insert_fn(maps: voxel_map.VoxelMap, scan: PointCloud) -> voxel_map.VoxelMap:
        xyz, nrm, mask, w = insert_sharded(
            maps.cloud.xyz, maps.cloud.normals, maps.cloud.mask, maps.weight,
            scan.xyz[None], scan.normals[None], scan.mask[None])
        return voxel_map.VoxelMap(
            cloud=PointCloud(xyz=xyz, normals=nrm, mask=mask), weight=w)

    def _nn(local_xyz, local_nrm, local_mask, q_xyz, q_mask, max_dist):
        idx, d2, found = bruteforce.nn(q_xyz[0], q_mask[0], local_xyz[0], max_dist[0])
        match_xyz = local_xyz[0][idx]
        match_nrm = local_nrm[0][idx]
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
        return (out_xyz[None], out_nrm[None], best_d2[None], found_any[None])

    nn_sharded = shard_map(
        _nn, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
    )

    @jax.jit
    def nn_fn(maps: voxel_map.VoxelMap, query_xyz: Array, query_mask: Array,
              max_dist):
        xyz, nrm, d2, found = nn_sharded(
            maps.cloud.xyz, maps.cloud.normals, maps.cloud.mask,
            query_xyz[None], query_mask[None],
            jnp.asarray(max_dist, jnp.float32)[None])
        return xyz[0], nrm[0], d2[0], found[0]

    @jax.jit
    def gather_fn(maps: voxel_map.VoxelMap) -> PointCloud:
        return PointCloud(
            xyz=maps.cloud.xyz.reshape(-1, 3),
            normals=maps.cloud.normals.reshape(-1, 3),
            mask=maps.cloud.mask.reshape(-1),
        )

    def empty_maps() -> voxel_map.VoxelMap:
        from ..utils.pointcloud import empty_cloud

        C = capacity_per_device
        cloud = PointCloud(
            xyz=jnp.full((D, C, 3), SENTINEL, jnp.float32),
            normals=jnp.zeros((D, C, 3), jnp.float32),
            mask=jnp.zeros((D, C), bool),
        )
        return voxel_map.VoxelMap(cloud=cloud, weight=jnp.zeros((D, C), jnp.float32))

    return empty_maps, insert_fn, nn_fn, gather_fn
