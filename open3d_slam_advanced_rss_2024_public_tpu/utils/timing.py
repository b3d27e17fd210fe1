"""Stopwatch + running-average timers and a stats registry.

≙ the reference's o3d_slam::Timer (open3d_slam/src/time.cpp:35-60 —
stopwatch, running average, optional print-on-destruct) and the
libpointmatcher PerformanceInspector's named-stat accumulation
(pointmatcher/InspectorsImpl.cpp): the runtime's observability surface
(scan-insertion averages, per-phase timings printed every N seconds,
SURVEY.md §5).
"""
from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict


class Timer:
    def __init__(self, name: str = "", print_on_exit: bool = False):
        self.name = name
        self.print_on_exit = print_on_exit
        self._start = None
        self.total_ms = 0.0
        self.count = 0
        self.last_ms = 0.0

    def start(self) -> None:
        self._start = time.perf_counter()

    def stop(self) -> float:
        if self._start is None:
            return 0.0
        self.last_ms = (time.perf_counter() - self._start) * 1e3
        self.total_ms += self.last_ms
        self.count += 1
        self._start = None
        return self.last_ms

    @property
    def avg_ms(self) -> float:
        return self.total_ms / max(self.count, 1)

    @property
    def hz(self) -> float:
        return 1e3 / max(self.avg_ms, 1e-9)

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()
        if self.print_on_exit:
            print(f"[timer] {self.name}: {self.last_ms:.2f} ms "
                  f"(avg {self.avg_ms:.2f} ms over {self.count})")


class StatsRegistry:
    """Named timers + scalar stats (≙ PerformanceInspector addStat)."""

    def __init__(self):
        self.timers: Dict[str, Timer] = defaultdict(Timer)
        self.stats: Dict[str, list] = defaultdict(list)

    @contextmanager
    def time(self, name: str):
        t = self.timers[name]
        t.start()
        try:
            yield
        finally:
            t.stop()

    def add_stat(self, name: str, value: float) -> None:
        self.stats[name].append(float(value))

    def summary(self) -> str:
        lines = []
        for name, t in sorted(self.timers.items()):
            lines.append(f"{name}: avg {t.avg_ms:.2f} ms over {t.count} ({t.hz:.1f} Hz)")
        for name, vals in sorted(self.stats.items()):
            if vals:
                import statistics

                lines.append(f"{name}: mean {statistics.fmean(vals):.4f} "
                             f"min {min(vals):.4f} max {max(vals):.4f} n={len(vals)}")
        return "\n".join(lines)

    def to_dict(self) -> dict:
        """Structured metrics snapshot — the machine-readable counterpart of
        the reference's shutdown timing printout (SlamWrapper.cpp:77-78,
        989-995): per-timer avg/count/Hz plus per-stat summary moments."""
        import statistics

        out = {"timers": {}, "stats": {}}
        for name, t in sorted(self.timers.items()):
            out["timers"][name] = {"avg_ms": round(t.avg_ms, 4),
                                   "count": t.count,
                                   "hz": round(t.hz, 3)}
        for name, vals in sorted(self.stats.items()):
            if vals:
                out["stats"][name] = {
                    "mean": statistics.fmean(vals),
                    "min": min(vals), "max": max(vals), "n": len(vals)}
        return out

    def dump_json(self, path: str) -> None:
        import json

        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=1)


GLOBAL_STATS = StatsRegistry()
