"""Fused SLAM pipeline step — one device program per scan.

The reference's hot path is spread over several stages with host hand-offs
(Mapper::addRangeMeasurement, Mapper.cpp:168-505: preprocess -> convert ->
crop submap -> kd-tree reference -> icp.compute -> insert).  The TPU-native
production path fuses all of it into a single XLA program:

    preprocess (crop -> voxel downsample -> PCA normals -> narrow crop)
    -> map-patch crop + matcher index around the pose estimate
    -> while-loop ICP (correspondence gather + robust weights + GN solve)
    -> fitness gate
    -> voxel-map fusion of the merge cloud at the refined pose

so each scan costs exactly ONE host->device dispatch (the pose comes back
asynchronously).  This removes the per-stage dispatch latency that
dominates at 100+ Hz — the analogue of the reference's per-scan
Open3D<->pointmatcher conversion boundary (Mapper.cpp:308-309) being a
host<->device transfer here.

The step is pure (MapState in -> MapState out) and therefore shards: run it
under shard_map with the map voxel array sharded over the mesh and the same
program scales to multi-chip (see parallel/sharded_map.py).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import hashgrid, voxel_map
from ..ops.registration import ICPConfig, ICPResult
from ..ops.registration import icp as icp_mod
from ..utils.pointcloud import PointCloud
from . import scan_processing

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Static configuration of the fused step (hashable -> jit static arg).

    Mirrors the parameter surface of the reference hot path:
    scan_processing (ScanToMapRegistration.cpp:36-69), submap cropping
    (:90-96), icp.yaml chain, min_refinement_fitness gate (Mapper.cpp
    min_refinement_fitness), map voxel fusion (Submap.cpp:82-96).
    """

    icp: ICPConfig = dataclasses.field(default_factory=ICPConfig)
    scan_voxel_size: float = 0.1
    scan_capacity: int = 8192
    crop_min_radius: float = 0.7
    crop_max_radius: float = 30.0
    normal_knn: int = 10
    map_patch_capacity: int = 32768
    map_voxel_size: float = 0.1
    min_refinement_fitness: float = 0.3
    # "auto" -> MXU radius-moments normals on TPU, kNN elsewhere.
    normal_engine: str = "auto"
    # Insertion gate: minimum motion since last insertion (reference
    # min_movement_between_mapping_steps, Mapper.cpp:483-489).
    min_movement_between_steps: float = 0.0
    # Extra crop radius for the block-shared ICP reference (covers robot
    # motion across one lag block, ≙ the staleness the reference accepts
    # between its periodic reference re-inits, Mapper.cpp:349-380).
    block_ref_margin: float = 4.0
    # Use the block-shared-reference program for saturated lag blocks
    # (mapper_step_block_shared_ref); single-scan blocks always use the
    # per-scan crop.
    shared_block_reference: bool = True


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MapState:
    """Device-side pipeline state: the active map + pose bookkeeping."""

    map: voxel_map.VoxelMap
    pose: Array                 # f32[4,4] current map->sensor
    last_insertion_pose: Array  # f32[4,4]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StepOutput:
    """Device-side extras of one fused step, consumed by the host Mapper:
    the ICP result, the preprocessed merge cloud in map frame (overlap
    buffer / dense map / carving inputs), and whether the min-motion gate
    admitted the insertion.

    ``pose`` and ``map_count`` duplicate fields derivable from the returned
    MapState on purpose: the async lag-K driver (models/mapper.py) chains
    states forward and must hold small per-scan readback targets separate
    from the chain.  They cost 20 bytes per scan and let a whole lag
    block read back in one ``jax.device_get``."""

    res: ICPResult
    merged: PointCloud
    inserted: Array   # bool scalar
    pose: Array       # f32[4,4] — the gated refined pose (== new state.pose)
    map_count: Array  # i32 scalar — occupied voxels AFTER this insertion
    dropped: Array    # f32 scalar — cumulative table-overflow drop counter


@partial(jax.jit, static_argnames=("map_capacity",))
def init_state(map_capacity: int, init_pose: Optional[Array] = None) -> MapState:
    # jitted so the state's buffers materialize on device as program
    # outputs (host eye/zeros land once, not per step).
    T = jnp.eye(4, dtype=jnp.float32) if init_pose is None else jnp.asarray(
        init_pose, jnp.float32)
    return MapState(map=voxel_map.empty(map_capacity), pose=T,
                    last_insertion_pose=T)


@jax.jit
def make_state(vmap, pose: Array, last_insertion_pose: Array) -> MapState:
    """Rebuild a chained device state from host truth (submap table + host
    poses) after an external mutation — loop-closure feedback, submap
    rollover, or a materialize().  Jitted so host-resident poses land on
    device once and the state's leaves are program outputs."""
    return MapState(map=vmap, pose=jnp.asarray(pose, jnp.float32),
                    last_insertion_pose=jnp.asarray(last_insertion_pose,
                                                    jnp.float32))


# NOTE on donation: the steps deliberately do NOT donate ``state``.  On the
# axon TPU backend donation of a chained state is catastrophically slow
# (measured round 4: 147 ms/step donated vs 20.6 ms/step undonated for the
# identical program — the runtime appears to serialize the chain on the
# donated buffer).  Undonated, the table costs one extra HBM copy per step
# (~6 MB at 2^17 slots, ~15 us at HBM bandwidth) and old states free as
# soon as the host drops them, so peak memory is two tables.  It also makes
# every host-held alias of a previous state's table permanently valid —
# no invalidated-buffer hazards anywhere in the Mapper's flush/materialize
# bookkeeping.
@partial(jax.jit, static_argnames=("cfg",))
def mapper_step(state: MapState, raw_scan: PointCloud, estimate_T: Array,
                cfg: PipelineConfig,
                insert_enable: Array = True) -> Tuple[MapState, StepOutput]:
    """One scan through the full pipeline as a single fused program.

    ``insert_enable`` is the host's merge-suppression gate (localization
    mode / map-merge delay, ≙ Mapper.cpp:466-479) — a traced scalar, so
    flipping it never recompiles.
    """
    return _step(state, raw_scan, estimate_T, cfg, insert_enable)


@partial(jax.jit, static_argnames=("cfg",))
def mapper_step_delta(state: MapState, raw_scan: PointCloud, odom_delta: Array,
                      cfg: PipelineConfig,
                      insert_enable: Array = True) -> Tuple[MapState, StepOutput]:
    """``mapper_step`` with the initial guess composed ON DEVICE from the
    odometry motion delta: estimate = pose x delta (≙ Mapper.cpp:265-300).

    This removes the only per-scan host round-trip of the per-scan driver
    (reading the refined pose back just to multiply it by the next delta):
    steps chain asynchronously — the host enqueues scan t+1 while scan t
    still runs, and poses stream back lazily.  Over the axon tunnel the
    blocking readback costs more than half the step (PROFILE.md round 3).
    """
    return _step(state, raw_scan, state.pose @ odom_delta, cfg, insert_enable)


def _step(state: MapState, raw_scan: PointCloud, estimate_T: Array,
          cfg: PipelineConfig, insert_enable: Array):
    wide = scan_processing.preprocess_scan(
        raw_scan,
        wide_min_radius=cfg.crop_min_radius,
        wide_max_radius=cfg.crop_max_radius,
        voxel_size=cfg.scan_voxel_size,
        downsampling_ratio=1.0,
        capacity=cfg.scan_capacity,
        estimate_scan_normals=True,
        normal_knn=cfg.normal_knn,
        normal_engine=scan_processing.resolve_normal_engine(cfg.normal_engine),
    )
    match = scan_processing.narrow_crop(wide, cfg.crop_min_radius,
                                        cfg.crop_max_radius)
    _, grid = scan_processing.crop_submap_and_index(
        state.map.cloud, estimate_T[:3, 3],
        min_radius=0.0, max_radius=cfg.crop_max_radius,
        match_dist=cfg.icp.max_correspondence_dist,
        capacity=cfg.map_patch_capacity,
        build_hash=(cfg.icp.matcher == "hashgrid"),
    )
    res = icp_mod.register(match, grid, estimate_T, cfg.icp)

    # Fitness gate (≙ Mapper min_refinement_fitness fallback).  First scan:
    # the empty map matches nothing — trust the estimate and insert.
    ok = res.match_ratio >= cfg.min_refinement_fitness
    empty_map = state.map.count() == 0
    use_icp = jnp.logical_and(ok, jnp.logical_not(empty_map))
    T = jnp.where(use_icp, res.transform, estimate_T)

    # Min-motion insertion gate x host merge-suppression gate.
    motion = jnp.linalg.norm(T[:3, 3] - state.last_insertion_pose[:3, 3])
    insert_ok = jnp.logical_and(
        jnp.asarray(insert_enable, bool),
        jnp.logical_or(motion >= cfg.min_movement_between_steps, empty_map))
    merged = wide.transform(T)
    gated = merged.with_mask(jnp.logical_and(merged.mask, insert_ok))
    new_map = voxel_map.insert(state.map, gated, cfg.map_voxel_size)
    new_state = MapState(
        map=new_map,
        pose=T,
        last_insertion_pose=jnp.where(insert_ok, T, state.last_insertion_pose),
    )
    return new_state, StepOutput(res=res, merged=merged, inserted=insert_ok,
                                 pose=T, map_count=new_map.count(),
                                 dropped=new_map.dropped)


@jax.jit
def chain_insert(state: MapState, cloud_map_frame: PointCloud,
                 voxel_size) -> MapState:
    """Fuse an already-registered map-frame cloud into the chained state's
    table without touching the pose chain.

    Used to re-fuse post-rollover tail records into the FRESH submap's
    chain as their readbacks land: voxel fusion is an order-independent
    weighted mean, so these inserts mix safely with newer scan steps
    already dispatched on the chain (models/mapper._process_block)."""
    return MapState(
        map=voxel_map.insert(state.map, cloud_map_frame, voxel_size),
        pose=state.pose,
        last_insertion_pose=state.last_insertion_pose,
    )


@jax.jit
def chain_insert_block(state: MapState, merged_stacked: PointCloud,
                       record_mask: Array, voxel_size) -> MapState:
    """Fuse a whole tail BLOCK's merged clouds ([K, N, ...] stacked step
    outputs, per-record enable mask bool[K]) into the chained table with
    ONE program — the per-record slice + insert dispatches cost ~14 ms
    each over the tunnel, and a rollover can leave up to 2*lag records on
    the tail path."""
    K, N = merged_stacked.xyz.shape[0], merged_stacked.xyz.shape[1]
    flat = jax.tree.map(
        lambda x: x.reshape((K * N,) + x.shape[2:]) if hasattr(x, "shape")
        and x.ndim >= 2 else x, merged_stacked)
    m = jnp.logical_and(merged_stacked.mask.reshape(-1),
                        jnp.repeat(record_mask, N))
    cloud = flat.with_mask(m)
    return MapState(
        map=voxel_map.insert(state.map, cloud, voxel_size),
        pose=state.pose,
        last_insertion_pose=state.last_insertion_pose,
    )


@partial(jax.jit, static_argnames=("cfg",))
def mapper_step_block(state: MapState, scans: PointCloud, odom_deltas: Array,
                      insert_enables: Array,
                      cfg: PipelineConfig) -> Tuple[MapState, StepOutput]:
    """K chained scans as ONE device program (``lax.scan`` over the fused
    step), returning per-scan outputs stacked on a leading axis.

    This is the Mapper's dispatch unit under back-pressure: over the axon
    tunnel every separately-dispatched program pays ~7 ms of inter-program
    gap when chained (measured round 4: 20.6 ms/step chained vs 13.1 ms
    isolated for the identical program), so the lag-K block amortizes that
    gap K-fold.  Padded slots (empty scans, identity deltas,
    insert_enable=False) pass through harmlessly: zero valid points match
    nothing, the fitness gate keeps the estimate, the pose chain is
    unchanged, and insertion is disabled.

    scans: stacked pytree [K, ...]; odom_deltas f32[K,4,4];
    insert_enables bool[K].
    """

    def body(st, inp):
        scan_i, delta_i, en_i = inp
        st2, out = _step(st, scan_i, st.pose @ delta_i, cfg, en_i)
        return st2, out

    return jax.lax.scan(body, state, (scans, odom_deltas, insert_enables))


@partial(jax.jit, static_argnames=("cfg",))
def mapper_step_block_shared_ref(state: MapState, scans: PointCloud,
                                 odom_deltas: Array, insert_enables: Array,
                                 cfg: PipelineConfig
                                 ) -> Tuple[MapState, StepOutput]:
    """``mapper_step_block`` with two block-level restructurings:

    1. Scan preprocessing is BATCHED over the K scans (vmap) instead of
       re-entering the per-scan sequential chain — the argsort/moments
       kernels run at [K, N] shapes with one launch each.
    2. The ICP reference (map patch crop + matcher grid) is built ONCE per
       block from the chain state at block start, exactly the reference's
       periodic reference re-init (Mapper.cpp:349-380: the libpointmatcher
       reference + kd-tree rebuild every ``referenceCloudSettingPeriod``
       seconds, NOT every scan — at lag 8 / 10 Hz the staleness is 0.8 s,
       well under the reference's 1-2 s default).  The crop radius gets a
       ``block_ref_margin`` so scans late in the block stay covered as
       the robot moves; insertion still lands in the LIVE chained table
       every scan.
    """

    def pre(s):
        wide = scan_processing.preprocess_scan(
            s,
            wide_min_radius=cfg.crop_min_radius,
            wide_max_radius=cfg.crop_max_radius,
            voxel_size=cfg.scan_voxel_size,
            downsampling_ratio=1.0,
            capacity=cfg.scan_capacity,
            estimate_scan_normals=True,
            normal_knn=cfg.normal_knn,
            normal_engine=scan_processing.resolve_normal_engine(
                cfg.normal_engine),
        )
        match = scan_processing.narrow_crop(wide, cfg.crop_min_radius,
                                            cfg.crop_max_radius)
        return wide, match

    wides, matches = jax.vmap(pre)(scans)

    _, grid = scan_processing.crop_submap_and_index(
        state.map.cloud, state.pose[:3, 3],
        min_radius=0.0, max_radius=cfg.crop_max_radius + cfg.block_ref_margin,
        match_dist=cfg.icp.max_correspondence_dist,
        capacity=cfg.map_patch_capacity,
        build_hash=(cfg.icp.matcher == "hashgrid"),
    )
    empty_map = state.map.count() == 0

    # Registration chain: with the block-shared reference, ICP of scan
    # t+1 depends only on scan t's POSE (not the evolving map), so the
    # scan carry is just (pose, last_insertion_pose).
    def body(carry, inp):
        pose_c, last_ins = carry
        wide_i, match_i, delta_i, en_i = inp
        estimate_T = pose_c @ delta_i
        res = icp_mod.register(match_i, grid, estimate_T, cfg.icp)
        ok = res.match_ratio >= cfg.min_refinement_fitness
        use_icp = jnp.logical_and(ok, jnp.logical_not(empty_map))
        T = jnp.where(use_icp, res.transform, estimate_T)
        motion = jnp.linalg.norm(T[:3, 3] - last_ins[:3, 3])
        insert_ok = jnp.logical_and(
            jnp.asarray(en_i, bool),
            jnp.logical_or(motion >= cfg.min_movement_between_steps,
                           empty_map))
        merged = wide_i.transform(T)
        new_last = jnp.where(insert_ok, T, last_ins)
        return (T, new_last), (res, merged, insert_ok, T)

    (pose_f, last_f), (ress, mergeds, insert_oks, Ts) = jax.lax.scan(
        body, (state.pose, state.last_insertion_pose),
        (wides, matches, odom_deltas, insert_enables))

    # ONE fused insert for the whole block (voxel fusion is an order-
    # independent weighted mean): ~2.8 ms per-scan insert cost amortizes
    # K-fold.  map_count/dropped consequently report BLOCK-END values for
    # every record — the rollover budget check is per-block anyway.
    K, N = mergeds.xyz.shape[0], mergeds.xyz.shape[1]
    flat = jax.tree.map(
        lambda x: x.reshape((K * N,) + x.shape[2:]) if hasattr(x, "shape")
        and x.ndim >= 2 else x, mergeds)
    m = jnp.logical_and(mergeds.mask.reshape(-1), jnp.repeat(insert_oks, N))
    new_map = voxel_map.insert(state.map, flat.with_mask(m),
                               cfg.map_voxel_size)
    new_state = MapState(map=new_map, pose=pose_f,
                         last_insertion_pose=last_f)
    outs = StepOutput(
        res=ress, merged=mergeds, inserted=insert_oks, pose=Ts,
        map_count=jnp.broadcast_to(new_map.count(), (K,)),
        dropped=jnp.broadcast_to(new_map.dropped, (K,)))
    return new_state, outs


def run_sequence(state: MapState, scans: PointCloud, odom_deltas: Array,
                 cfg: PipelineConfig) -> Tuple[MapState, Array]:
    """Scan-at-a-time driver with host-free sequencing via lax.scan.

    ``scans``: stacked PointCloud pytree with leading time axis [S, ...];
    ``odom_deltas``: f32[S,4,4] per-step odometry motion (initial-guess
    deltas).  Returns final state + all refined poses f32[S,4,4].  SLAM is
    sequential (scan t+1's guess depends on t's result — SURVEY §7 hard
    parts), so throughput comes from intra-scan parallelism; the scan loop
    keeps the whole sequence on-device with zero per-scan dispatches.
    """

    def body(st, inp):
        scan_i, delta_i = inp
        st2, _ = _step(st, scan_i, st.pose @ delta_i, cfg, True)
        return st2, st2.pose

    return jax.lax.scan(body, state, (scans, odom_deltas))
