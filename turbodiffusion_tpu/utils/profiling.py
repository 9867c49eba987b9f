"""Profiling / tracing utilities.

Reference: imaginaire/utils/profiling.py:33-133 (torch.profiler chrome traces
per iteration window, CUDA memory snapshots) and NVTX ranges (misc.py:494).
TPU equivalents: jax.profiler perfetto traces, device memory breakdown, and
a per-op time aggregator over the captured trace.
"""

from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import os
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/tdx_trace"):
    """Capture a device trace (perfetto/tensorboard compatible).
    ≡ maybe_enable_profiling (profiling.py:33-82)."""
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        yield logdir


def op_time_breakdown(logdir: str, top_n: int = 25) -> Dict[str, float]:
    """Aggregate per-op device time (ms) from the newest captured trace."""
    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        return {}
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    agg: collections.Counter = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "dur" in e and \
                "TPU" in pids.get(e.get("pid"), ""):
            agg[e["name"]] += e["dur"]
    return {k: v / 1e3 for k, v in agg.most_common(top_n)}


def device_memory_report() -> str:
    """Live device memory stats (≡ CUDA memory snapshot,
    profiling.py:86-133)."""
    lines = []
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            used = stats.get("bytes_in_use", 0) / 2 ** 30
            limit = stats.get("bytes_limit", 0) / 2 ** 30
            lines.append(f"{d}: {used:.2f} / {limit:.2f} GiB in use")
        except Exception:
            lines.append(f"{d}: memory stats unavailable")
    return "\n".join(lines)


class StepTimer:
    """Per-phase wall timers (≡ misc.TrainingTimer, misc.py:326)."""

    def __init__(self):
        self.totals: Dict[str, float] = collections.defaultdict(float)
        self.counts: Dict[str, int] = collections.defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        return " | ".join(
            f"{k}: {self.totals[k]/max(self.counts[k],1)*1e3:.1f}ms"
            for k in self.totals)
