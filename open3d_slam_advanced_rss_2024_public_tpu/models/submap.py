"""Submaps and their collection: bounded map chunks with lifecycle.

TPU-native equivalent of the reference's submap machinery:
  - Submap — sparse voxel-mean map + optional dense map + per-submap
    feature cloud (reference: open3d_slam_rsl/.../src/Submap.cpp:27-288),
  - SubmapCollection — active-submap selection by proximity/adjacency, new
    submap on travel distance, scan-overlap replay into new submaps,
    finished-submap queue -> feature computation -> loop-closure candidates
    (reference: src/SubmapCollection.cpp:28-409),
  - AdjacencyMatrix — undirected submap graph with BFS distance to the
    nearest loop-closure submap (reference: src/AdjacencyMatrix.cpp).

Split of responsibilities (SURVEY.md §7 design stance): lifecycle and graph
bookkeeping are host-side control flow; the per-scan map fusion and
cropping run as jitted fixed-shape programs on device (ops.voxel_map).
"""
from __future__ import annotations

import dataclasses
from collections import deque
from typing import Dict, List, Optional, Set

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import voxel_map
from ..ops.voxel_map import VoxelMap
from ..utils import se3
from ..utils.config import MapperParameters
from ..utils.pointcloud import PointCloud


@jax.jit
def _masked_centroid(xyz, mask, fallback):
    w = mask.astype(jnp.float32)
    n = w.sum()
    s = (xyz * w[:, None]).sum(axis=0)
    return jnp.where(n > 0, s / jnp.maximum(n, 1.0), fallback)


class AdjacencyMatrix:
    """Undirected submap graph (host-side; a handful of nodes)."""

    def __init__(self) -> None:
        self._adj: Dict[int, Set[int]] = {}

    def add_edge(self, a: int, b: int) -> None:
        self._adj.setdefault(a, set()).add(b)
        self._adj.setdefault(b, set()).add(a)

    def is_adjacent(self, a: int, b: int) -> bool:
        return b in self._adj.get(a, ())

    def bfs_distance(self, start: int, targets: Set[int]) -> int:
        """Graph distance from ``start`` to the nearest node in ``targets``
        (≙ getDistanceToNearestLoopClosureSubmap, AdjacencyMatrix.cpp:23-54).
        Returns a large value when unreachable."""
        if start in targets:
            return 0
        seen = {start}
        frontier = deque([(start, 0)])
        while frontier:
            node, d = frontier.popleft()
            for nb in self._adj.get(node, ()):
                if nb in targets:
                    return d + 1
                if nb not in seen:
                    seen.add(nb)
                    frontier.append((nb, d + 1))
        return 1 << 30


@dataclasses.dataclass
class Submap:
    """One bounded map chunk.  Device arrays: map_ (VoxelMap), dense_map_,
    feature cloud + descriptors (filled on finish)."""

    submap_id: int
    parent_id: int
    creation_time: float
    map: VoxelMap
    dense_map: Optional[VoxelMap] = None
    # Pose of the submap frame in the map frame; scans are stored in map
    # frame (like the reference, whose submaps transform rigidly on loop
    # closure — Submap.cpp:115-128).
    pose: np.ndarray = dataclasses.field(default_factory=lambda: np.eye(4, dtype=np.float32))
    feature_cloud: Optional[PointCloud] = None
    features: Optional[jnp.ndarray] = None  # [M, 33] FPFH
    n_scans: int = 0
    # Map-cloud centroid, computed ONCE when the submap is finished
    # (≙ computeSubmapCenter, Submap.cpp:282-286, called from
    # SubmapCollection.cpp:217 on rollover).  While the submap is ACTIVE
    # its "center" is the creation origin (Submap.cpp:203-205:
    # ``isCenterComputed_ ? submapCenter_ : mapToSubmap_.translation()``)
    # — a running centroid would track the robot and defeat the
    # travel-distance rollover criterion.
    _center: Optional[np.ndarray] = None
    # In-flight device centroid: compute_center dispatches the masked mean
    # and pre-issues the host copy; center() resolves it lazily (a COLD
    # synchronous 3-float readback over the axon tunnel costs tens of ms
    # on the rollover path — by the next center() call the transfer has
    # already landed).
    _center_dev: Optional[object] = None

    def is_empty(self) -> bool:
        return self.n_scans == 0

    def center(self) -> np.ndarray:
        if self._center is None and self._center_dev is not None:
            try:
                ready = self._center_dev.is_ready()
            except AttributeError:
                ready = True
            if ready:
                self._center = np.asarray(self._center_dev, dtype=np.float64)
                self._center_dev = None
            else:
                # Still riding the device queue: return the creation-origin
                # fallback rather than blocking the map worker behind every
                # queued program (proximity gating tolerates one stale
                # read; the exact centroid adopts on the next call).
                return self.pose[:3, 3].copy()
        if self._center is not None:
            return self._center
        return self.pose[:3, 3].copy()

    def compute_center(self) -> None:
        """≙ Submap::computeSubmapCenter (Submap.cpp:282-286).

        Device-side masked mean; the 3-float readback is pre-issued async
        and resolved on the first center() call — materializing the full
        table to host just for a centroid would cost a map-sized transfer
        on every rollover."""
        c = _masked_centroid(self.map.cloud.xyz, self.map.cloud.mask,
                             jnp.asarray(self.pose[:3, 3], jnp.float32))
        c.copy_to_host_async()
        self._center = None
        self._center_dev = c

    # True when transform() moved the accumulator content without
    # re-keying the table (cheap path for closed submaps); ensure_keys()
    # rebuilds before any further insert/carve (re-activation).
    keys_stale: bool = False

    def transform(self, T: np.ndarray) -> None:
        """Rigidly move every layer (≙ Submap::transform).

        Content-only table transform (elementwise, ~30x cheaper than the
        re-keying rebuild) — valid because pose-graph feedback targets
        closed submaps, which receive no inserts; ensure_keys() re-keys
        lazily if this submap is ever re-activated.  Pose/center update in
        pure numpy — a synchronous 4x4 readback here would serialize the
        loop-closure feedback behind everything queued on the chip."""
        Tj = jnp.asarray(T, jnp.float32)
        self.map = voxel_map.transform_content(self.map, Tj)
        if self.dense_map is not None:
            self.dense_map = voxel_map.transform_content(self.dense_map, Tj)
        self.keys_stale = True
        if self.feature_cloud is not None:
            self.feature_cloud = self.feature_cloud.transform(Tj)
        Tn = np.asarray(T, dtype=np.float64)
        self._after_transform(Tn)

    def ensure_keys(self) -> None:
        """Re-key the table(s) if a content-only transform left the stored
        voxel keys stale — required before this submap accepts inserts or
        carving again (re-activation on revisit, chain rebuild)."""
        if not self.keys_stale:
            return
        self.map = voxel_map.rekey(self.map)
        if self.dense_map is not None:
            self.dense_map = voxel_map.rekey(self.dense_map)
        self.keys_stale = False

    def _after_transform(self, Tn: np.ndarray) -> None:
        if self._center_dev is not None:
            # Resolve a pending centroid BEFORE moving the frame (blocking
            # here is fine: transform is the rare loop-closure feedback
            # path, and adopting the creation-origin fallback would freeze
            # the wrong center).
            self._center = np.asarray(self._center_dev, dtype=np.float64)
            self._center_dev = None
        self.pose = (Tn @ self.pose.astype(np.float64)).astype(np.float32)
        if self._center is not None:
            self._center = Tn[:3, :3] @ self._center + Tn[:3, 3]
