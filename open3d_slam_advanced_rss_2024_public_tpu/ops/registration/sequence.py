"""ICPSequence: sliding-map registration with an amortized reference.

TPU-native equivalent of libpointmatcher's ICPSequence (reference:
pointmatcher/ICP.cpp:476-630 — keep one filtered reference ("map") alive
across many ``compute(cloud, guess)`` calls so reference filtering and
index construction are paid once, not per scan).

Here "index construction" = building the voxel hash grid (or the
lex-sorted dense array for the Pallas/MXU matchers); registration then
runs against the persistent grid.  The Mapper's periodic reference
re-init (Mapper.cpp:349-367) is exactly ``set_map`` on a new patch.
"""
from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from ...utils.pointcloud import PointCloud
from .. import hashgrid
from .icp import ICPConfig, ICPResult, register

Array = jax.Array


class ICPSequence:
    """Persistent-reference ICP (≙ PM::ICPSequence).

    >>> seq = ICPSequence(cfg)
    >>> seq.set_map(map_patch)          # ≙ setMap: filter + index once
    >>> res = seq.compute(scan, T_init)  # ≙ operator()(cloud, guess)
    """

    def __init__(self, cfg: ICPConfig = ICPConfig(),
                 chain: Optional["object"] = None,
                 table_size: int = 1 << 14):
        # ``chain`` is an optional IcpChain whose reference pipeline is
        # applied by set_map and whose reading pipeline by compute.
        self.cfg = chain.config if chain is not None else cfg
        self.chain = chain
        self.table_size = table_size
        self._grid: Optional[hashgrid.HashGrid] = None

    def has_map(self) -> bool:
        """≙ ICPSequence::hasMap."""
        return self._grid is not None

    def set_map(self, cloud: PointCloud, key: Optional[Array] = None) -> None:
        """Filter the map cloud (when built from a chain) and (re)build the
        persistent reference index. ≙ ICPSequence::setMap / initReference."""
        if self.chain is not None:
            cloud = self.chain.process_reference(cloud, key)
        self._grid = hashgrid.build(cloud, self.cfg.max_correspondence_dist,
                                    table_size=self.table_size)

    def clear_map(self) -> None:
        """≙ ICPSequence::clearMap."""
        self._grid = None

    @property
    def map_grid(self) -> hashgrid.HashGrid:
        if self._grid is None:
            raise RuntimeError("ICPSequence: no map set (call set_map first)")
        return self._grid

    def compute(self, reading: PointCloud, init_T: Array,
                key: Optional[Array] = None) -> ICPResult:
        """Register a scan against the persistent map."""
        if self._grid is None:
            raise RuntimeError("ICPSequence: no map set (call set_map first)")
        if self.chain is not None:
            reading = self.chain.process_reading(reading, key)
        return register(reading, self._grid, jnp.asarray(init_T, jnp.float32),
                        self.cfg)

    __call__ = compute
