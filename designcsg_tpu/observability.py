"""Logging, timing, and profiling.

The reference's observability is a mutexed GUI console + redirected stdout +
a 100ms monitor thread rendering export state/elapsed/memory
(reference: /root/reference/master/DesignCSG.cpp:300-310,575-601,839-1025).
Library equivalents: a structured logger, a stage-timing registry, a
``jax.profiler`` trace context, and an :class:`ExportMonitor` progress
renderer for terminals.
"""

from __future__ import annotations

import contextlib
import logging
import os
import sys
import time
from dataclasses import dataclass, field
from typing import Dict, Optional

logger = logging.getLogger("designcsg_tpu")


def configure_logging(level=logging.INFO, path: Optional[str] = None):
    """Console + optional file logging (the reference's debug console and
    consolelog.txt channels)."""
    logger.setLevel(level)
    fmt = logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(fmt)
    logger.addHandler(handler)
    if path:
        fh = logging.FileHandler(path)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


@dataclass
class StageTimer:
    """Accumulates wall-clock per named stage; renders a report table."""

    stages: Dict[str, float] = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + time.time() - t0

    def report(self) -> str:
        total = sum(self.stages.values())
        lines = [f"{'stage':<24s}{'seconds':>10s}{'share':>8s}"]
        for name, secs in self.stages.items():
            share = 100.0 * secs / total if total else 0.0
            lines.append(f"{name:<24s}{secs:>10.2f}{share:>7.1f}%")
        lines.append(f"{'total':<24s}{total:>10.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def profile_trace(log_dir: str, host_tracer_level: int = 2):
    """Capture a jax.profiler trace (view with TensorBoard / xprof) —
    the framework's answer to the reference having no profiler at all
    (SURVEY.md §5.1)."""
    import jax

    with jax.profiler.trace(log_dir, create_perfetto_link=False):
        yield


class ExportMonitor:
    """Terminal progress renderer for export_mesh's progress callback —
    the reference's monitor thread (stage state machine + elapsed time +
    per-level triangle histogram, DesignCSG.cpp:839-1025), minus the thread:
    export_mesh invokes it inline and shares its extraction-telemetry dict
    via :meth:`attach_stats`."""

    def __init__(self, out=sys.stderr, min_interval: float = 0.25):
        self._out = out
        self._t0 = time.time()
        self._last = 0.0
        self._min_interval = min_interval
        self._stats: Optional[dict] = None

    def attach_stats(self, stats: dict):
        """export_mesh hands over its live telemetry dict (mutated by the
        extractors as slabs/levels complete)."""
        self._stats = stats

    @staticmethod
    def _rss_mb() -> Optional[float]:
        """Resident set size in MB from /proc/self/statm — the reference's
        monitor thread shows process memory every 100 ms during export
        (DesignCSG.cpp:852-894 via psutil)."""
        try:
            with open("/proc/self/statm") as f:
                rss_pages = int(f.read().split()[1])
            return rss_pages * os.sysconf("SC_PAGE_SIZE") / 1e6
        except (OSError, ValueError, IndexError):
            return None

    def _mem_suffix(self) -> str:
        rss = self._rss_mb()
        return f" rss {rss:6.0f}MB" if rss is not None else ""

    def _count_suffix(self) -> str:
        if not self._stats:
            return ""
        if "level_triangles" in self._stats:  # adaptive strategy
            total = sum(self._stats["level_triangles"].values())
            return f" {total:>9d} tris"
        if "slab_triangles" in self._stats:
            total = sum(self._stats["slab_triangles"].values())
            return f" {total:>9d} tris"
        if "slab_cells_active" in self._stats:  # compact strategy
            total = sum(self._stats["slab_cells_active"].values())
            return f" {total:>9d} cells"
        return ""

    def __call__(self, stage: str, frac: float):
        now = time.time()
        if now - self._last < self._min_interval and frac < 1.0:
            return
        self._last = now
        elapsed = now - self._t0
        bar_n = int(frac * 30)
        bar = "#" * bar_n + "-" * (30 - bar_n)
        self._out.write(
            f"\r[{elapsed:7.1f}s] {stage:<26s} [{bar}] {frac*100:5.1f}%"
            f"{self._count_suffix()}{self._mem_suffix()}"
        )
        if frac >= 1.0:
            self._out.write("\n")
        self._out.flush()

    def render_histogram(self, stats: Optional[dict] = None) -> str:
        """Post-run histogram table — the reference prints triangle counts
        per octree level during export (DesignCSG.cpp:896-924); the uniform
        strategies histogram per slab instead."""
        stats = stats if stats is not None else (self._stats or {})
        if "level_triangles" in stats:
            items = sorted(stats["level_triangles"].items())
            label = "level"
        elif "slab_triangles" in stats:
            items = sorted(stats["slab_triangles"].items())
            label = "slab z0"
        else:
            return ""
        total = max(1, sum(c for _, c in items))
        width = 40
        lines = [f"{label:>8s}  {'triangles':>10s}"]
        for k, c in items:
            bar = "#" * max(0, int(round(width * c / total)))
            lines.append(f"{k:>8d}  {c:>10d}  {bar}")
        return "\n".join(lines)
