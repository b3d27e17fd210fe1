"""Time-indexed pose buffer with interpolation/extrapolation — host side.

TPU-native counterpart of the reference's TransformInterpolationBuffer
(reference: open3d_slam_rsl/.../src/TransformInterpolationBuffer.cpp:16-222 —
ordered push with out-of-order rejection, slerp lookup, 2-point
extrapolation into the future) and of the ROS TF tree the online wrapper
queries.

This is orchestration state (scheduling, initial guesses), so it lives on
the host in numpy — the device only ever sees the already-resolved 4x4
initial-guess matrix.  Interpolation math delegates to utils.se3 (jitted
once, tiny).
"""
from __future__ import annotations

import bisect
from typing import List, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from . import se3


class TransformInterpolationBuffer:
    """Bounded, time-ordered pose buffer.

    Pushes must be (weakly) increasing in time; out-of-order pushes are
    rejected with a warning counter (reference
    TransformInterpolationBuffer.cpp:22-46).
    """

    def __init__(self, size_limit: int = 2000):
        self.size_limit = size_limit
        self._times: List[float] = []
        self._poses: List[np.ndarray] = []
        self.rejected_pushes = 0

    def __len__(self) -> int:
        return len(self._times)

    @property
    def empty(self) -> bool:
        return not self._times

    def earliest_time(self) -> float:
        return self._times[0]

    def latest_time(self) -> float:
        return self._times[-1]

    def latest_measurement(self, n_from_end: int = 0) -> np.ndarray:
        return self._poses[-1 - n_from_end]

    def set_size_limit(self, limit: int) -> None:
        self.size_limit = limit
        self._trim()

    def push(self, time: float, pose) -> bool:
        pose = np.asarray(pose, dtype=np.float32)
        if self._times and time < self._times[-1]:
            self.rejected_pushes += 1
            return False
        if self._times and time == self._times[-1]:
            self._poses[-1] = pose  # overwrite same-stamp (reference updates)
            return True
        self._times.append(float(time))
        self._poses.append(pose)
        self._trim()
        return True

    def _trim(self) -> None:
        while len(self._times) > self.size_limit:
            self._times.pop(0)
            self._poses.pop(0)

    def has(self, time: float) -> bool:
        return bool(self._times) and self._times[0] <= time <= self._times[-1]

    def lookup(self, time: float) -> np.ndarray:
        """Interpolated pose at ``time``; clamps outside the buffered range
        only at the start (queries before the first pose return it)."""
        if not self._times:
            raise ValueError("empty transform buffer")
        if time <= self._times[0]:
            return self._poses[0]
        if time >= self._times[-1]:
            return self._poses[-1]
        i = bisect.bisect_right(self._times, time)
        t0, t1 = self._times[i - 1], self._times[i]
        alpha = (time - t0) / max(t1 - t0, 1e-12)
        T = se3.interpolate(jnp.asarray(self._poses[i - 1]), jnp.asarray(self._poses[i]),
                            jnp.float32(alpha))
        return np.asarray(T)

    def get_transform(self, time: float) -> np.ndarray:
        """Lookup with constant-velocity extrapolation beyond the newest pose
        (reference free function getTransform,
        TransformInterpolationBuffer.cpp:190-218)."""
        if not self._times:
            raise ValueError("empty transform buffer")
        if len(self._times) >= 2 and time > self._times[-1]:
            t0, t1 = self._times[-2], self._times[-1]
            alpha = (time - t0) / max(t1 - t0, 1e-12)
            T = se3.extrapolate(jnp.asarray(self._poses[-2]), jnp.asarray(self._poses[-1]),
                                jnp.float32(alpha))
            return np.asarray(T)
        return self.lookup(time)

    def relative_motion(self, t0: float, t1: float) -> np.ndarray:
        """Motion delta lookup(t0)^-1 * lookup(t1) — the odometry prior the
        mapper chains onto the last refined pose (reference
        Mapper.cpp:265-300)."""
        T0 = jnp.asarray(self.get_transform(t0))
        T1 = jnp.asarray(self.get_transform(t1))
        return np.asarray(se3.compose(se3.inverse(T0), T1))

    def apply_to_all(self, fn) -> None:
        """Apply a correction to every buffered pose (loop-closure feedback,
        reference SlamWrapper::updateSubmapsAndTrajectory)."""
        self._poses = [np.asarray(fn(p), dtype=np.float32) for p in self._poses]

    def items(self) -> List[Tuple[float, np.ndarray]]:
        return list(zip(self._times, self._poses))
