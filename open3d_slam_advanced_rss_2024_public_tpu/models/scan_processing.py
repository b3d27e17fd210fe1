"""Scan preprocessing for matching + merging — one fused jitted pass.

TPU-native equivalent of ScanToMapIcp's preprocessing
(reference: open3d_slam_rsl/.../src/ScanToMapRegistration.cpp:36-69 —
wide crop (map-builder cropper) -> voxelize -> normals -> random
downsample, then a narrow crop (scan-matcher cropper) of the result for
matching; cropSubmap crops the active submap around the robot :90-96).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import croppers, filters, hashgrid, normals
from ..utils import se3
from ..utils.config import ScanProcessingParameters, ScanCroppingParameters
from ..utils.pointcloud import PointCloud

Array = jax.Array


def _cropper(p: ScanCroppingParameters) -> croppers.CropVolume:
    return croppers.cropper_from_config(p.cropper_type, p.cropping_radius_min,
                                        p.cropping_radius_max)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ProcessedScans:
    """match: narrow-cropped cloud fed to ICP; merge: wide-cropped cloud
    inserted into the map (≙ ProcessedScans, ScanToMapRegistration.hpp)."""

    match: PointCloud
    merge: PointCloud


def resolve_normal_engine(name: str) -> str:
    """"auto" -> MXU moments kernel on TPU, kNN elsewhere."""
    if name != "auto":
        return name
    import jax as _jax

    return "moments" if _jax.default_backend() not in ("cpu", "gpu") else "knn"


@partial(jax.jit, static_argnames=("voxel_size", "downsampling_ratio", "capacity",
                                  "estimate_scan_normals", "normal_knn", "seed",
                                  "normal_engine"))
def preprocess_scan(scan: PointCloud,
                    wide_min_radius: float, wide_max_radius: float,
                    voxel_size: float, downsampling_ratio: float,
                    capacity: int,
                    estimate_scan_normals: bool = True,
                    normal_radius: float = 0.5,
                    normal_knn: int = 10,
                    seed: int = 0,
                    normal_engine: str = "knn") -> PointCloud:
    """Wide crop -> voxel downsample -> normals -> random downsample.

    ≙ ScanToMapIcp::preprocess (ScanToMapRegistration.cpp:36-45).  The
    random stage uses a fixed seed so replays are deterministic, matching
    the reference's reproducibility note (:43-44).
    """
    scan = filters.remove_non_finite(scan)
    wide = croppers.min_max_radius_cropper(wide_min_radius, wide_max_radius)
    scan = scan.with_mask(wide.contains(scan.xyz))
    # Morton-ordered downsample: ONE argsort groups voxels AND leaves the
    # output in Z-order, so the tile-sparse Pallas matcher's query tiles
    # are spatially tight with no separate spatial sort.  Exact because
    # the wide crop bounds the extent far below the 1024-cell Morton range.
    out = filters.voxel_downsample(scan, voxel_size, capacity, order="morton")
    if estimate_scan_normals:
        if normal_engine in ("moments", "moments_interpret"):
            out = normals.estimate_normals_radius(
                out, radius=normal_radius,
                interpret=(normal_engine == "moments_interpret"))
        else:
            out = normals.estimate_normals(out, radius=normal_radius, k=normal_knn)
    if downsampling_ratio < 1.0:
        out = filters.random_sampling(out, jax.random.PRNGKey(seed), downsampling_ratio)
    return out


@jax.jit
def narrow_crop(cloud: PointCloud, min_radius, max_radius) -> PointCloud:
    """Scan-matcher crop of the preprocessed scan (identity pose), ≙
    processForScanMatchingAndMerging (:59-69)."""
    c = croppers.min_max_radius_cropper(min_radius, max_radius)
    return cloud.with_mask(c.contains(cloud.xyz))


@partial(jax.jit, static_argnames=("capacity", "table_size", "build_hash"))
def crop_submap_and_index(map_cloud: PointCloud, robot_position: Array,
                          min_radius, max_radius, match_dist,
                          capacity: int, table_size: int = 1 << 15,
                          build_hash: bool = True):
    """Crop the active submap around the robot and build the matcher grid.

    ≙ ScanToMapIcp::cropSubmap (ScanToMapRegistration.cpp:90-96) followed by
    libpointmatcher ICP::initReference's matcher build (ICP.cpp:291-326).
    Returns (patch cloud, HashGrid) — the grid is the persistent ICP
    reference reused across scans until the next periodic re-init
    (reference Mapper.cpp:349-380).
    """
    rel = map_cloud.xyz - robot_position
    r = jnp.linalg.norm(jnp.where(map_cloud.mask[:, None], rel, 0.0), axis=-1)
    inside = (r >= min_radius) & (r <= max_radius)
    patch = map_cloud.with_mask(inside)
    from ..utils.pointcloud import compact

    patch = compact(patch, capacity)
    if build_hash:
        grid = hashgrid.build(patch, cell_size=match_dist, table_size=table_size)
    else:
        # Brute-force/Pallas matchers: Morton-sort the patch so the
        # tile-sparse NN kernel sees spatially compact ref tiles (the
        # persistent voxel table stores slots in hash order, which is
        # spatially random).  Amortized: the grid persists until the next
        # reference re-init (≙ Mapper.cpp:349-380).
        grid = hashgrid.passthrough(hashgrid.morton_sort(patch, match_dist),
                                    match_dist)
    return patch, grid
