"""Inspectors: per-iteration tracing and performance stats for ICP.

TPU-native equivalent of libpointmatcher's Inspector framework (reference:
pointmatcher/InspectorsImpl.{h,cpp} — PerformanceInspector accumulates named
stats; VTKFileInspector dumps every ICP iteration's clouds to VTK files for
offline inspection, selected in ros/open3d_slam_ros/param/icp.yaml:39-41).

Host round-trips per iteration would destroy the fused ``lax.while_loop``
driver, so inspection runs as a SEPARATE unrolled ``lax.scan`` program over
the same :func:`icp.iteration_step` the production loop uses: one device
program returns the full per-iteration trajectory + stats, then the host
writes dump files.  Inspecting costs exactly ``max_iterations`` steps (no
early exit) — the same trade VTKFileInspector makes (it is a debug tool).
"""
from __future__ import annotations

import dataclasses
import os
import time as _time
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import se3
from ...utils.pointcloud import PointCloud
from .. import hashgrid
from .icp import ICPConfig, iteration_step, reference_centroid

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ICPTrace:
    """Per-iteration registration trace (max_iterations entries).

    transforms[i] = pose AFTER iteration i; deltas/stats align with it.
    """

    transforms: Array    # [I, 4, 4]
    rot_deltas: Array    # [I]
    trans_deltas: Array  # [I]
    match_ratios: Array  # [I]
    rmses: Array         # [I]


@partial(jax.jit, static_argnames=("cfg",))
def register_trace(source: PointCloud, ref_grid: hashgrid.HashGrid,
                   init_T: Array, cfg: ICPConfig = ICPConfig()) -> ICPTrace:
    """Run ``max_iterations`` ICP steps recording every iterate.

    Same per-iteration math as :func:`icp.register` (shared
    ``iteration_step``), but as a ``lax.scan`` with no early stop so the
    whole trace is one device program.
    """
    centroid = reference_centroid(ref_grid)

    def step(T, _):
        T_new, rd, td, mr, rmse = iteration_step(cfg, source, ref_grid, centroid, T)
        return T_new, (T_new, rd, td, mr, rmse)

    _, (Ts, rds, tds, mrs, rmses) = jax.lax.scan(
        step, jnp.asarray(init_T, jnp.float32), None, length=cfg.max_iterations)
    return ICPTrace(transforms=Ts, rot_deltas=rds, trans_deltas=tds,
                    match_ratios=mrs, rmses=rmses)


def dump_iterations(source: PointCloud, ref_grid: hashgrid.HashGrid,
                    init_T: Array, cfg: ICPConfig, out_dir: str,
                    prefix: str = "icp", fmt: str = "vtk") -> List[str]:
    """Write per-iteration transformed reading clouds + a stats table.

    ≙ VTKFileInspector::dumpIteration (reference InspectorsImpl.cpp) —
    produces ``<prefix>-reading-0000.vtk`` ... plus ``<prefix>-stats.csv``.
    Returns the list of file paths written.
    """
    from ...utils import io as cloud_io

    trace = register_trace(source, ref_grid, init_T, cfg)
    os.makedirs(out_dir, exist_ok=True)
    paths: List[str] = []
    Ts = np.asarray(trace.transforms)
    for i in range(Ts.shape[0]):
        moved = source.transform(jnp.asarray(Ts[i]))
        p = os.path.join(out_dir, f"{prefix}-reading-{i:04d}.{fmt}")
        cloud_io.save_cloud(p, moved) if fmt != "vtk" else cloud_io.save_vtk(p, moved)
        paths.append(p)
    stats_path = os.path.join(out_dir, f"{prefix}-stats.csv")
    with open(stats_path, "w") as f:
        f.write("iteration,rot_delta,trans_delta,match_ratio,rmse\n")
        for i in range(Ts.shape[0]):
            f.write(f"{i},{float(trace.rot_deltas[i]):.8f},"
                    f"{float(trace.trans_deltas[i]):.8f},"
                    f"{float(trace.match_ratios[i]):.6f},"
                    f"{float(trace.rmses[i]):.6f}\n")
    paths.append(stats_path)
    return paths


class PerformanceInspector:
    """Named-stat accumulator (≙ PerformanceInspector::addStat /
    dumpStats — reference InspectorsImpl.cpp).

    Wraps registration calls and accumulates wall time, iteration counts,
    match ratios; integrates with utils.timing's registry style.
    """

    def __init__(self):
        self.stats: Dict[str, List[float]] = {}

    def add_stat(self, name: str, value: float) -> None:
        self.stats.setdefault(name, []).append(float(value))

    def wrap(self, fn):
        """Wrap a registration callable; records duration + result stats."""

        def wrapped(*args, **kwargs):
            t0 = _time.perf_counter()
            res = fn(*args, **kwargs)
            jax.block_until_ready(res.transform)
            self.add_stat("duration_s", _time.perf_counter() - t0)
            self.add_stat("iterations", float(res.iterations))
            self.add_stat("match_ratio", float(res.match_ratio))
            self.add_stat("rmse", float(res.rmse))
            return res

        return wrapped

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, vals in self.stats.items():
            arr = np.asarray(vals)
            out[name] = {"count": int(arr.size), "mean": float(arr.mean()),
                         "min": float(arr.min()), "max": float(arr.max())}
        return out

    def dump_stats(self) -> str:
        lines = [f"{k}: n={v['count']} mean={v['mean']:.6f} "
                 f"min={v['min']:.6f} max={v['max']:.6f}"
                 for k, v in self.summary().items()]
        return "\n".join(lines)
