"""Scan-to-map mapper — the hot-path owner.

TPU-native equivalent of the reference Mapper
(reference: open3d_slam_rsl/.../src/Mapper.cpp:33-553):
  - initial guess = previous refined pose x odometry motion delta
    (Mapper.cpp:265-300),
  - scan-to-map ICP (Mapper.cpp:387-394 icp_.compute),
  - out-of-order fallback via odometry propagation (Mapper.cpp:196-235),
  - min-motion gating before insertion (Mapper.cpp:483-489),
  - map-merge suppression in localization mode (Mapper.cpp:466-479).

Host/device split (round 4 — the async fast path): all device work for a
scan is the single fused program ``pipeline.mapper_step_delta`` (preprocess
-> map-patch crop + matcher index -> while-loop ICP -> fitness gate ->
voxel fusion into the ACTIVE submap's table), with the initial guess
composed ON DEVICE from the odometry motion delta, so consecutive scans
chain with ZERO blocking host round-trips.  Refined poses, fitness, and
insertion flags stream back in lag-K blocks (one batched ``device_get``
every ``pose_readback_lag`` scans), consumed by a dedicated READER thread
(round 5) that performs the blocking readbacks in order and runs the host
bookkeeping — trajectory buffers, submap rollover, carving — so the
caller thread only dispatches, throttled by a bounded in-flight window.
This is exactly the driver bench.py measures: the shipped
``add_range_measurement`` and the benchmark headline are the same code
path.

State ownership invariant: while ``self._state`` is set, the live map is
the device-side chained state and the active submap's ``map`` attribute
may be up to one flush stale (always valid — the steps never donate);
``materialize()`` flushes pending steps and hands truth back to the
submap before any external read/mutation (assembled map, loop-closure
feedback, saving).
"""
from __future__ import annotations

import dataclasses
import threading
from collections import deque
from typing import Deque, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.registration import ICPConfig
from ..utils.config import SlamParameters
from ..utils.pointcloud import PointCloud
from ..utils.timebuf import TransformInterpolationBuffer
from ..utils.timing import GLOBAL_STATS as _STATS
from . import pipeline


def resolve_matcher(name: str) -> str:
    if name != "auto":
        return name
    import jax

    platform = jax.devices()[0].platform
    return "pallas" if platform not in ("cpu", "gpu") else "bruteforce"


def icp_config_from_params(params: SlamParameters) -> ICPConfig:
    reg = params.mapper.mapper_localizer.scan_to_map_registration
    minimizer = {
        "PointToPlaneIcp": "point_to_plane",
        "PointToPointIcp": "point_to_point",
        "GeneralizedIcp": "gicp",
    }[reg.scan_to_map_refinement_type]
    return ICPConfig(
        matcher=resolve_matcher(reg.matcher),
        max_iterations=reg.icp.max_n_iter,
        max_correspondence_dist=reg.icp.max_correspondence_dist,
        trimmed_ratio=reg.trimmed_ratio,
        normal_max_angle=reg.normal_max_angle,
        use_normal_gate=(minimizer == "point_to_plane"),
        min_diff_rot=reg.min_diff_rot,
        min_diff_trans=reg.min_diff_trans,
        smooth_length=reg.smooth_length,
        minimizer=minimizer,
    )


def pipeline_config_from_params(params: SlamParameters) -> pipeline.PipelineConfig:
    """SlamParameters -> the fused step's static config (the one hot path)."""
    ml = params.mapper.mapper_localizer
    reg = ml.scan_to_map_registration
    sp = reg.scan_processing
    crop = sp.scan_cropping
    return pipeline.PipelineConfig(
        icp=icp_config_from_params(params),
        scan_voxel_size=sp.voxel_size,
        scan_capacity=sp.point_capacity,
        crop_min_radius=crop.cropping_radius_min,
        crop_max_radius=crop.cropping_radius_max,
        map_patch_capacity=reg.map_patch_capacity,
        map_voxel_size=params.mapper.map_builder.map_voxel_size,
        min_refinement_fitness=(0.0 if ml.ignore_minimum_refinement_fitness
                                else reg.min_refinement_fitness),
        min_movement_between_steps=ml.min_movement_between_mapping_steps,
    )


@dataclasses.dataclass
class MapperStats:
    scans_processed: int = 0
    scans_rejected_low_fitness: int = 0
    out_of_order: int = 0
    insertions: int = 0
    # Voxels dropped by the fixed-capacity table, accumulated MONOTONICALLY
    # across submap rollovers / evictions / table swaps (ADVICE r3+r4: the
    # raw per-table counter restarts whenever the chained table is
    # replaced; the Mapper tracks per-table deltas into this total).
    map_voxels_dropped: int = 0
    # Finalized records evicted unread because no consumer drained them
    # (ADVICE r4: direct Mapper drivers that never call drain_finalized).
    finalized_evicted: int = 0


@dataclasses.dataclass
class _QueuedScan:
    """One scan accepted but not yet dispatched (host-side block builder)."""

    time: float
    scan: PointCloud        # the (motion-compensated) input scan
    motion: np.ndarray      # odometry delta fed as the on-device guess
    insert_enable: bool


@dataclasses.dataclass
class _InflightBlock:
    """One dispatched lag-K block awaiting its readback."""

    items: List[_QueuedScan]            # the real scans (padding excluded)
    outs: pipeline.StepOutput           # stacked [K, ...] device outputs
    # Set when a LATER-processed rollover made this pre-rollover block's
    # device fusion land in the closed submap: its records re-fuse into
    # the fresh chain on readback (order-independent weighted means).
    tail: bool = False


@dataclasses.dataclass
class Finalized:
    """One scan's host-visible result, produced at flush time.  Consumers
    (SlamWrapper's trajectory log and dense-map worker) drain these in
    order.  ``merged`` is the preprocessed scan already in map frame — a
    zero-arg thunk (slicing the stacked block output enqueues device ops,
    so it resolves lazily) or None for scans that never ran the device
    step (out-of-order / external-pose paths)."""

    time: float
    pose: np.ndarray
    merged: object  # Optional[Callable[[], PointCloud]]
    raw: Optional[PointCloud]
    fitness: float = 1.0
    inserted: bool = False


def _make_pad_scan(template: PointCloud) -> PointCloud:
    """An all-invalid scan with the template's shapes, used to pad partial
    lag blocks: zero valid points match nothing, the fitness gate keeps the
    pose, and insertion is disabled for pad slots."""
    from ..utils.pointcloud import SENTINEL

    return PointCloud(
        xyz=jnp.full_like(template.xyz, SENTINEL),
        normals=jnp.zeros_like(template.normals),
        mask=jnp.zeros_like(template.mask),
        attrs=(None if template.attrs is None
               else jnp.zeros_like(template.attrs)),
        attr_names=template.attr_names)


class Mapper:
    def __init__(self, params: SlamParameters,
                 odom_buffer: Optional[TransformInterpolationBuffer] = None):
        from .submap_collection import SubmapCollection

        self.params = params
        self.icp_cfg = icp_config_from_params(params)
        self.pipe_cfg = pipeline_config_from_params(params)
        self._validate_map_extent(params)
        self.submaps = SubmapCollection(params.mapper)
        self.odom_buffer = odom_buffer if odom_buffer is not None else TransformInterpolationBuffer()
        self.map_to_range_sensor = np.eye(4, dtype=np.float32)
        self.map_to_range_sensor_prev = np.eye(4, dtype=np.float32)
        self.map_to_range_sensor_buffer = TransformInterpolationBuffer()
        self.best_guess_buffer = TransformInterpolationBuffer()
        self.calibration = np.eye(4, dtype=np.float32)
        self.last_measurement_time: Optional[float] = None
        self.last_insertion_pose = np.eye(4, dtype=np.float32)
        self.stats = MapperStats()
        self.is_new_value_set = False  # external pose override pending
        self.is_use_initial_map = params.mapper.mapper_localizer.is_use_map_initialization
        self.is_merge_scans_into_map = params.mapper.mapper_localizer.is_merge_scans_into_map
        self.init_time: Optional[float] = None
        # Async fast path: chained device state, a host-side queue of scans
        # building the next block, and dispatched blocks awaiting readback
        # (see module docstring invariant).
        self._state: Optional[pipeline.MapState] = None
        self._queue: List[_QueuedScan] = []
        self._inflight: Deque[_InflightBlock] = deque()
        self.readback_lag = max(
            int(params.mapper.mapper_localizer.pose_readback_lag), 1)
        # Template empty scan used to pad partial blocks (built lazily from
        # the first scan's shapes).
        self._pad_scan: Optional[PointCloud] = None
        # Per-scan results in flush order, drained by the runtime (bounded:
        # an undrained consumer must not pin merged clouds forever; records
        # evicted at the cap get their device-buffer thunks nulled and are
        # counted in stats.finalized_evicted — see _finalize).
        self.finalized: Deque[Finalized] = deque()
        self.finalized_cap = 4096
        # Last-seen value of the CURRENT table's cumulative drop counter
        # (restarts when the chained table is swapped — rollover, eviction,
        # transform); stats.map_voxels_dropped accumulates the deltas.
        self._dropped_seen = 0
        # One lock serializes state/pending mutation: the map worker steps
        # while finish/save/loop-closure threads flush or materialize.
        self._lock = threading.RLock()
        # Dedicated readback thread (round 5): the caller thread only
        # DISPATCHES blocks; the reader performs the blocking device_get
        # for each in-flight block IN ORDER and runs the host bookkeeping
        # under the lock.  The hot path therefore never waits on the
        # device queue (the round-4 design blocked ~15-20 ms/scan whenever
        # background programs rode the same queue).  In-flight depth is
        # bounded by max_inflight_blocks for memory/rollover-lag reasons.
        self._cv = threading.Condition(self._lock)
        self._reader: Optional[threading.Thread] = None
        self.max_inflight_blocks = 4

    @staticmethod
    def _validate_map_extent(params: SlamParameters) -> None:
        """ADVICE r3: the voxel table addresses a ±512-cell cube around the
        first insert's centroid (ops/voxel_map.py packing).  A config whose
        crop radius alone exceeds that half-extent truncates every scan —
        reject it; a config whose rollover distance plus crop radius
        exceeds it can truncate late in a submap's life — warn, and the
        per-flush ``stats.map_voxels_dropped`` counter makes any actual
        truncation observable."""
        import warnings

        from ..ops import voxel_map as vm

        ml = params.mapper.mapper_localizer
        crop = ml.scan_to_map_registration.scan_processing.scan_cropping
        half = vm._HALF * params.mapper.map_builder.map_voxel_size
        if crop.cropping_radius_max > half:
            raise ValueError(
                f"scan crop radius {crop.cropping_radius_max} m exceeds the "
                f"voxel table's addressable half-extent "
                f"{half:.1f} m (= 512 x map_voxel_size "
                f"{params.mapper.map_builder.map_voxel_size}); in-view points "
                f"would silently vanish — raise map_voxel_size or shrink the "
                f"crop")
        reach = crop.cropping_radius_max + params.mapper.submaps.submap_size
        if reach > half:
            warnings.warn(
                f"submap_size + crop radius = {reach:.1f} m exceeds the voxel "
                f"table's addressable half-extent {half:.1f} m; scans near a "
                f"submap's rollover boundary may truncate (watch "
                f"MapperStats.map_voxels_dropped)", stacklevel=3)

    # -- external pose interface (≙ setMapToRangeSensor / loopClosureUpdate) --

    def set_map_to_range_sensor(self, T: np.ndarray) -> None:
        with self._lock:
            self.flush()
            self.map_to_range_sensor = np.asarray(T, dtype=np.float32).copy()
            self.is_new_value_set = True

    def loop_closure_update(self, correction: np.ndarray) -> None:
        """≙ Mapper::loopClosureUpdate (Mapper.cpp:92-95): apply the pose-
        graph correction to the current and previous refined pose."""
        with self._lock:
            self.materialize()
            c = np.asarray(correction, dtype=np.float32)
            self.map_to_range_sensor = c @ self.map_to_range_sensor
            self.map_to_range_sensor_prev = c @ self.map_to_range_sensor_prev
            self.last_insertion_pose = c @ self.last_insertion_pose

    # -- async state management ----------------------------------------------

    def _ensure_state(self) -> None:
        if self._state is None:
            sm = self.submaps.active_submap
            self._state = pipeline.make_state(
                sm.map, self.map_to_range_sensor, self.last_insertion_pose)

    def materialize(self) -> None:
        """Flush in-flight steps and hand map ownership back to the active
        submap.  Call before any external read of the active submap's table
        (assembled map, saving) or mutation of pose/map state (loop-closure
        feedback).  The next scan rebuilds the chained state (one extra
        non-donating dispatch)."""
        with self._lock:
            self.flush()
            if self._state is not None:
                self.submaps.active_submap.map = self._state.map
                self._state = None

    def _dispatch_block(self) -> None:
        """Stack the queued scans into ONE lag-K block program and start
        async host copies of the small readback leaves.

        Block sizes are 1 (idle / single-scan path) or ``readback_lag``
        (saturated path; partial blocks pad with empty scans that pass
        through the fused step harmlessly) — exactly two compiled
        variants."""
        items = self._queue
        if not items:
            return
        self._queue = []
        if self._reader is None:
            self._reader = threading.Thread(target=self._reader_loop,
                                            name="mapper-readback",
                                            daemon=True)
            self._reader.start()
        K = self.readback_lag
        n = len(items)
        scans = [q.scan for q in items]
        motions = [q.motion for q in items]
        ens = [q.insert_enable for q in items]
        if 1 < n < K:
            if self._pad_scan is None:
                self._pad_scan = _make_pad_scan(items[0].scan)
            scans += [self._pad_scan] * (K - n)
            motions += [np.eye(4, dtype=np.float32)] * (K - n)
            ens += [False] * (K - n)
        sb = jax.tree.map(lambda *xs: jnp.stack(xs), *scans)
        db = jnp.asarray(np.stack(motions).astype(np.float32))
        eb = jnp.asarray(np.asarray(ens, dtype=bool))
        self._ensure_state()
        block_fn = (pipeline.mapper_step_block_shared_ref
                    if (self.pipe_cfg.shared_block_reference and len(scans) > 1)
                    else pipeline.mapper_step_block)
        self._state, outs = block_fn(
            self._state, sb, db, eb, self.pipe_cfg)
        # Pre-issue the host copies: by the time this block is processed
        # (one block behind), the transfer has ridden the tunnel already.
        for leaf in (outs.pose, outs.res.match_ratio, outs.inserted,
                     outs.map_count, outs.dropped):
            leaf.copy_to_host_async()
        self._inflight.append(_InflightBlock(items=items, outs=outs))
        self._cv.notify_all()

    def _reader_loop(self) -> None:
        """Dedicated readback thread: block on each in-flight block's
        device_get IN ORDER (outside the lock), then run its host
        bookkeeping under the lock.  Only this thread pops _inflight, so
        flush() can simply wait for the deque to drain.  A rollover
        rebuilds the chain immediately and tags the still-inflight blocks
        as tail — NO draining (round 5)."""
        while True:
            with self._cv:
                while not self._inflight:
                    self._cv.wait(timeout=0.5)
                blk = self._inflight[0]
            with _STATS.time("mapper/block_readback"):
                vals = jax.device_get((blk.outs.pose, blk.outs.res.match_ratio,
                                       blk.outs.inserted, blk.outs.map_count,
                                       blk.outs.dropped))
            with self._cv:
                self._inflight.popleft()
                try:
                    if self._process_block(blk, False, vals):
                        self._rebuild_after_rollover()
                except Exception:  # noqa: BLE001 — a dead reader would
                    # hang every flush() forever; surface loudly, drop the
                    # block, keep draining (the reference's workers are
                    # similarly exception-insulated per item).
                    import traceback

                    traceback.print_exc()
                finally:
                    self._cv.notify_all()

    def _rebuild_after_rollover(self) -> None:
        """A processed block rolled the submap over: the fresh active
        submap was host-assembled (overlap replay + same-block tail
        inserts); rebuild the chained state from it NOW so newly
        dispatched scans fuse into the fresh table, and tag every block
        still in flight as tail — their records re-fuse into the chain
        asynchronously when their readbacks land (insertion into weighted
        voxel means is order-independent).  The closed submap keeps the
        pre-rollover chain-end table.

        The rebuilt chain pose must be the pose estimate of the LAST
        DISPATCHED scan, not the just-processed record's: blocks still in
        flight carry newer scans whose refined poses haven't read back
        yet.  Compose their odometry motion deltas onto the current pose
        (pure odometry extrapolation across <= inflight scans — the next
        dispatched scan's on-device initial guess continues from there
        and ICP re-anchors it)."""
        with _STATS.time("mapper/rollover_rebuild"):
            chain_pose = self.map_to_range_sensor.astype(np.float64)
            for blk in self._inflight:
                for q in blk.items:
                    chain_pose = chain_pose @ q.motion.astype(np.float64)
            self._state = pipeline.make_state(
                self.submaps.active_submap.map,
                chain_pose.astype(np.float32), self.last_insertion_pose)
        for blk in self._inflight:
            blk.tail = True

    def _process_block(self, blk: _InflightBlock, rolled: bool,
                       vals=None) -> bool:
        """Host bookkeeping for one dispatched block: pose/trajectory
        buffers, fitness stats, submap rollover, carving.  Returns True if
        any record triggered a submap rollover (records after it in the
        SAME block route to the tail path; the caller rebuilds the chain
        and tags later in-flight blocks — see _rebuild_after_rollover).
        For a block tagged ``tail`` every record re-fuses into the chain.
        ``vals``: the block's readback when the caller (reader thread)
        already fetched it outside the lock."""
        new_roll = False
        rolled = rolled or blk.tail
        if vals is None:
            with _STATS.time("mapper/block_readback"):
                vals = jax.device_get((blk.outs.pose, blk.outs.res.match_ratio,
                                       blk.outs.inserted, blk.outs.map_count,
                                       blk.outs.dropped))
        poses, matches, inserteds, mcounts, droppeds = (np.asarray(v) for v in vals)
        ml = self.params.mapper.mapper_localizer
        sc = self.submaps
        block_drops = 0
        tail_mask = np.zeros(len(blk.items), dtype=bool)
        for k, q in enumerate(blk.items):
            pose = poses[k].astype(np.float32)
            best_guess = (self.map_to_range_sensor_prev @ q.motion).astype(
                np.float32)
            self.map_to_range_sensor = pose
            self.map_to_range_sensor_prev = pose.copy()
            self.map_to_range_sensor_buffer.push(q.time, pose)
            self.best_guess_buffer.push(q.time, best_guess)
            fitness = float(matches[k])
            if (not ml.ignore_minimum_refinement_fitness
                    and fitness < ml.scan_to_map_registration.min_refinement_fitness):
                # The device program already fell back to the odometry
                # estimate (fitness gate inside the step); count it here.
                self.stats.scans_rejected_low_fitness += 1
            # Monotone drop accounting: the raw counter is cumulative PER
            # TABLE and restarts on every table swap (rollover, transform);
            # a negative delta means a fresh table whose whole counter is
            # new drops (ADVICE r4).
            d = int(droppeds[k])
            delta = d - self._dropped_seen
            if delta < 0:
                delta = d
            if delta > 0:
                self.stats.map_voxels_dropped += delta
                block_drops += delta
            self._dropped_seen = d
            # Lazy per-scan view of the stacked merged cloud: slicing
            # enqueues device ops, so consumers (overlap replay, carving,
            # dense map) resolve it only when actually needed.
            merged_thunk = (lambda o=blk.outs.merged, kk=k:
                            jax.tree.map(lambda x: x[kk], o))
            if bool(inserteds[k]):
                if not rolled:
                    # Hand the live chain-end table to the submap so
                    # rollover/carving see it (no donation -> the alias
                    # stays valid indefinitely).
                    sc.active_submap.map = self._state.map
                    with _STATS.time("mapper/post_insert"):
                        changed = sc.post_insert_update(
                            merged_thunk, pose, q.time,
                            active_count=int(mcounts[k]))
                    if changed:
                        rolled = True
                        new_roll = True
                    elif sc.active_submap.map is not self._state.map:
                        # Carving replaced the table: adopt it as the new
                        # chained state (carve ran on the chain-end table,
                        # so nothing dispatched is lost).
                        self._state = pipeline.MapState(
                            map=sc.active_submap.map,
                            pose=self._state.pose,
                            last_insertion_pose=self._state.last_insertion_pose)
                else:
                    # Records behind a rollover: device fusion landed in
                    # the CLOSED submap (kept — same spirit as the
                    # reference's scan-overlap); re-fuse them into the
                    # fresh active submap.
                    with _STATS.time("mapper/rollover_tail_insert"):
                        if blk.tail and not new_roll:
                            # Chain already rebuilt onto the fresh submap:
                            # per-record bookkeeping only — the block's
                            # clouds batch-fuse into the live chain in ONE
                            # program after the loop (chain_insert_block),
                            # and the lifecycle re-checks once per block.
                            sc.overlap_buffer.append(
                                (merged_thunk, pose, q.time))
                            sc.active_submap.n_scans += 1
                            sc.num_scans_merged_in_active += 1
                            tail_mask[k] = True
                        else:
                            # A rollover happened earlier in THIS block
                            # (chain rebuild pending at the caller) —
                            # host-insert into the fresh submap's table
                            # with full lifecycle.
                            sc.insert_scan(merged_thunk, pose, q.time)
                self.last_insertion_pose = pose.copy()
                self.stats.insertions += 1
            self._finalize(Finalized(
                time=q.time, pose=pose, merged=merged_thunk, raw=q.scan,
                fitness=fitness, inserted=bool(inserteds[k])))
        if tail_mask.any():
            # Batched tail re-fusion: one program for all of this block's
            # post-rollover records, then one lifecycle re-check at the
            # last record's pose (full checks minus the point-budget gate
            # — the device map_count refers to the closed table; the
            # budget re-checks on the next normal block).
            with _STATS.time("mapper/rollover_tail_insert"):
                K_blk = int(blk.outs.merged.xyz.shape[0])
                rec_mask = np.zeros(K_blk, dtype=bool)
                rec_mask[:len(tail_mask)] = tail_mask
                self._state = pipeline.chain_insert_block(
                    self._state, blk.outs.merged, jnp.asarray(rec_mask),
                    self.pipe_cfg.map_voxel_size)
                sc.active_submap.map = self._state.map
                last_k = int(np.nonzero(tail_mask)[0][-1])
                if sc.lifecycle_check(poses[last_k].astype(np.float32),
                                      blk.items[last_k].time,
                                      active_count=0):
                    new_roll = True
        mb = self.params.mapper.map_builder
        if (block_drops > 0
                and mb.is_overflow_eviction_enabled and not rolled):
            # Overflow policy: this block dropped voxels — evict a
            # fraction of the chain-end table so subsequent scans land
            # (the PRIMARY capacity bound stays the submap point-budget
            # rollover).  Default policy: keep the voxels NEAREST the
            # current pose — scan-to-map ICP only touches the local
            # neighborhood, and weight-keyed eviction drops exactly the
            # newest frontier surfaces (see voxel_map.evict_far).
            from ..ops import voxel_map as vm

            if mb.overflow_evict_policy == "weight":
                evicted = vm.evict_low_weight(
                    self._state.map,
                    keep_fraction=mb.overflow_evict_keep_fraction)
            else:
                evicted = vm.evict_far(
                    self._state.map,
                    jnp.asarray(self.map_to_range_sensor[:3, 3]),
                    keep_fraction=mb.overflow_evict_keep_fraction)
            self._state = pipeline.MapState(
                map=evicted,
                pose=self._state.pose,
                last_insertion_pose=self._state.last_insertion_pose)
        return new_roll

    def flush(self) -> None:
        """Dispatch any partial block and BLOCK until the reader thread
        has drained every in-flight block's bookkeeping (trajectory
        buffers, fitness stats, submap rollover, carving)."""
        with self._cv:
            self._dispatch_block()
            while self._inflight:
                self._cv.wait(timeout=0.5)

    def poll(self) -> None:
        """Online idle tick: dispatch the partial block once the device
        pipeline is empty (pose freshness when the stream pauses).  The
        reader thread handles all draining — nothing here blocks."""
        with self._cv:
            if self._queue and not self._inflight:
                self._dispatch_block()

    def _finalize(self, rec: Finalized) -> None:
        """Append a per-scan record for drain_finalized, evicting past the
        cap.  Evicted records get their merged/raw references nulled so an
        undrained long run cannot pin whole stacked-block device buffers
        in HBM (ADVICE r4); evictions are counted in
        stats.finalized_evicted."""
        self.finalized.append(rec)
        while len(self.finalized) > self.finalized_cap:
            old = self.finalized.popleft()
            old.merged = None
            old.raw = None
            self.stats.finalized_evicted += 1

    def drain_finalized(self) -> List[Finalized]:
        with self._lock:
            out = list(self.finalized)
            self.finalized.clear()
        return out

    # -- the hot path --------------------------------------------------------

    def add_range_measurement(self, raw_scan: PointCloud, time: float) -> bool:
        """≙ Mapper::addRangeMeasurement (Mapper.cpp:168-505).

        Async driver: enqueues one fused device step and returns without
        blocking; host bookkeeping runs on lag-block readbacks (flush).

        Per-scan results accumulate in ``finalized`` — long-running
        consumers should call ``drain_finalized()`` periodically (the
        SlamWrapper map worker does); past ``finalized_cap`` undrained
        records the oldest are evicted with their device-buffer thunks
        nulled (counted in stats.finalized_evicted)."""
        with self._lock:
            return self._add_range_measurement(raw_scan, time)

    def _add_range_measurement(self, raw_scan: PointCloud, time: float) -> bool:
        ml = self.params.mapper.mapper_localizer

        # First scan: insert directly at the current pose (the fused step's
        # empty-map branch trusts the estimate).  Synchronous.
        if self.submaps.empty() or self.submaps.active_submap.is_empty():
            self.submaps.ensure_active(self.map_to_range_sensor, time)
            self._ensure_state()
            self._state, out = pipeline.mapper_step(
                self._state, raw_scan, jnp.asarray(self.map_to_range_sensor),
                self.pipe_cfg, True)
            self.submaps.note_fused_insert()
            self.map_to_range_sensor_prev = self.map_to_range_sensor.copy()
            self.map_to_range_sensor_buffer.push(time, self.map_to_range_sensor)
            self.best_guess_buffer.push(time, self.map_to_range_sensor)
            self.last_insertion_pose = self.map_to_range_sensor.copy()
            self.last_measurement_time = time
            self.init_time = time
            self.is_new_value_set = False
            self.stats.scans_processed += 1
            self.stats.insertions += 1
            self._finalize(Finalized(
                time=time, pose=self.map_to_range_sensor.copy(),
                merged=(lambda o=out.merged: o), raw=raw_scan, inserted=True))
            return True

        # Out-of-order: propagate by last odometry motion (Mapper.cpp:196-235).
        if self.last_measurement_time is not None and time <= self.last_measurement_time:
            self.flush()
            self.stats.out_of_order += 1
            if len(self.odom_buffer) >= 2:
                t_latest = self.odom_buffer.latest_time()
                delta = self.odom_buffer.relative_motion(self.last_measurement_time, t_latest)
                backup = self.map_to_range_sensor_prev @ delta
                self.map_to_range_sensor = backup.astype(np.float32)
                self.map_to_range_sensor_buffer.push(t_latest, self.map_to_range_sensor)
                self.best_guess_buffer.push(t_latest, self.map_to_range_sensor_prev)
                self.map_to_range_sensor_prev = self.map_to_range_sensor.copy()
            self._finalize(Finalized(
                time=time, pose=self.map_to_range_sensor.copy(),
                merged=None, raw=raw_scan))
            return True

        # Odometry motion delta for the on-device initial guess (:265-300):
        # estimate = state.pose x motion, composed inside the fused step.
        motion = np.eye(4, dtype=np.float32)
        if not self.odom_buffer.empty and not self.is_new_value_set:
            calib_inv = np.linalg.inv(self.calibration)
            odom_now = self.odom_buffer.get_transform(time) @ calib_inv
            odom_prev = self.odom_buffer.get_transform(
                self.last_measurement_time if self.last_measurement_time is not None else time
            ) @ calib_inv
            motion = (np.linalg.inv(odom_prev) @ odom_now).astype(np.float32)

        if self.is_new_value_set:
            # External pose was just set; trust it, skip refinement.  The
            # pending block was flushed by set_map_to_range_sensor; replace
            # the chained pose without touching the table.
            if self._state is not None:
                self._state = pipeline.make_state(
                    self._state.map, self.map_to_range_sensor,
                    self.last_insertion_pose)
            self.map_to_range_sensor_prev = self.map_to_range_sensor.copy()
            self.map_to_range_sensor_buffer.push(time, self.map_to_range_sensor)
            self.best_guess_buffer.push(time, self.map_to_range_sensor)
            self.is_new_value_set = False
            self.init_time = time
            self.last_measurement_time = time
            self._finalize(Finalized(
                time=time, pose=self.map_to_range_sensor.copy(),
                merged=None, raw=raw_scan))
            return True

        # Localization mode: suppress merging (Mapper.cpp:466-479).  Host
        # flag, traced scalar on-device (no recompile on flips).
        merge_suppressed = (
            (self.is_use_initial_map and not self.is_merge_scans_into_map)
            or (self.is_use_initial_map and self.is_merge_scans_into_map
                and self.init_time is not None
                and (time - self.init_time) < ml.map_merge_delay_in_seconds)
        )

        self._queue.append(_QueuedScan(time=time, scan=raw_scan, motion=motion,
                                       insert_enable=not merge_suppressed))
        self.last_measurement_time = time
        self.stats.scans_processed += 1
        if len(self._queue) >= self.readback_lag:
            self._dispatch_block()
            # Backpressure only: the reader thread drains the blocks;
            # the hot path waits ONLY when the device has fallen a full
            # max_inflight_blocks window behind (memory + rollover-lag
            # bound).
            while len(self._inflight) >= self.max_inflight_blocks:
                self._cv.wait(timeout=0.5)
        return True

    def get_assembled_map(self) -> PointCloud:
        """≙ getAssembledMapPointCloud (Mapper.cpp:506-538)."""
        from ..utils.pointcloud import concatenate, empty_cloud

        self.materialize()
        clouds = [s.map.cloud for s in self.submaps.submaps]
        if not clouds:
            return empty_cloud(1)
        out = clouds[0]
        for c in clouds[1:]:
            out = concatenate(out, c)
        return out
