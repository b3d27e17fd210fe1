"""Constant-velocity LiDAR de-skewing.

TPU-native equivalent of ConstantVelocityMotionCompensation
(reference: open3d_slam_rsl/.../src/MotionCompensation.cpp:24-150 —
velocity estimated from the last N poses of the pose buffer :32-66,
per-point azimuth phase :129-148, per-point SE(3) correction :73-127).

The device side is a single vectorized kernel: given the scan and the
(linear, angular) velocity twist over the scan duration, every point is
moved by exp(phase_i * xi).  Phase comes from the point azimuth assuming a
spinning scanner; the host estimates the twist from its pose buffer.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import se3
from ..utils.pointcloud import PointCloud
from ..utils.timebuf import TransformInterpolationBuffer

Array = jax.Array


@partial(jax.jit, static_argnames=("is_spinning_clockwise",))
def compute_phase(xyz: Array, is_spinning_clockwise: bool = True) -> Array:
    """Relative scan phase in [0,1] per point from azimuth.

    ≙ ConstantVelocityMotionCompensation::computePhase
    (MotionCompensation.cpp:129-148): phase 0 at the start of the sweep,
    1 at the end; the sweep starts at azimuth pi (atan2 branch cut) and
    advances clockwise or counter-clockwise.
    """
    azimuth = jnp.arctan2(xyz[..., 1], xyz[..., 0])  # (-pi, pi]
    frac = (jnp.pi - azimuth) / (2.0 * jnp.pi)  # 0 at +pi, 1 at -pi
    return frac if is_spinning_clockwise else 1.0 - frac


@partial(jax.jit, static_argnames=("is_spinning_clockwise",))
def undistort(scan: PointCloud, twist: Array, is_spinning_clockwise: bool = True) -> PointCloud:
    """Apply per-point motion correction exp((phase-1) * twist).

    ``twist`` is the se(3) motion (omega, v) of the sensor over one full
    scan period, expressed in the sensor frame.  Points measured earlier in
    the sweep are corrected forward to the scan-end frame (the reference
    timestamps scans at the end of the sweep).

    When the scan carries a per-point time channel ``t`` (seconds relative
    to scan start, as deserialized from PointCloud2), the phase is exact:
    t_i / sweep_span, replacing the azimuth inference — the precise variant
    of the reference's computePhase (MotionCompensation.cpp:129-148, which
    infers phase from azimuth because its clouds lack per-point stamps).
    """
    import dataclasses as _dc

    if scan.has_attr("t"):
        t = scan.attr("t")
        span = jnp.maximum(jnp.max(jnp.where(scan.mask, t, 0.0)), 1e-6)
        phase = jnp.clip(t / span, 0.0, 1.0)
    else:
        phase = compute_phase(scan.xyz, is_spinning_clockwise)
    alpha = (phase - 1.0)[:, None]  # 0 for the newest points, -1 for oldest
    T = se3.se3_exp(alpha * twist[None, :])  # [N,4,4]
    xyz = jnp.einsum("nij,nj->ni", T[:, :3, :3], scan.xyz) + T[:, :3, 3]
    nrm = jnp.einsum("nij,nj->ni", T[:, :3, :3], scan.normals)
    return _dc.replace(
        scan,
        xyz=jnp.where(scan.mask[:, None], xyz, scan.xyz),
        normals=jnp.where(scan.mask[:, None], nrm, 0.0),
    )


def estimate_twist_from_buffer(buffer: TransformInterpolationBuffer,
                               scan_duration: float,
                               num_poses: int = 3) -> np.ndarray:
    """Host-side velocity estimate over the last ``num_poses`` buffer poses.

    ≙ estimateLinearAndAngularVelocity (MotionCompensation.cpp:32-66).
    Returns the se(3) twist covering one scan_duration.
    """
    if len(buffer) < 2:
        return np.zeros(6, dtype=np.float32)
    n = min(num_poses, len(buffer))
    items = buffer.items()[-n:]
    t0, T0 = items[0]
    t1, T1 = items[-1]
    dt = max(t1 - t0, 1e-6)
    import jax.numpy as jnp

    delta = se3.se3_log(se3.compose(se3.inverse(jnp.asarray(T0)), jnp.asarray(T1)))
    return np.asarray(delta) * (scan_duration / dt)
