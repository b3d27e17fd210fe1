"""Device-mesh construction for multi-chip SLAM.

The reference is a single-process multi-threaded stack with no distributed
backend (SURVEY.md §2.6); scale-out is a new capability of this build:
map points / scan points / pose-graph edges are sharded over a 1-D "data"
mesh axis, with psum reductions riding ICI (jax collectives), and
multi-host growth handled by jax.distributed + the same mesh abstractions.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_points(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Leading point dimension sharded across the mesh."""
    return NamedSharding(mesh, P(axis))

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
