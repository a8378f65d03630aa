"""Metrics / profiling / observability.

Replaces the reference's wall-clock print + percent counter
(main.cpp:93,115-116; render_kernel.cpp:191,205-209) with structured
per-phase metrics: rays/s, per-stage timers, and a jax.profiler trace hook
(SURVEY.md §5).

IMPORTANT backend note: on the tunneled axon TPU backend,
``block_until_ready`` returns before device completion — every timer here
forces a tiny host transfer to get honest wall-clock numbers.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import numpy as np


def sync(x) -> None:
    """Force true device completion (host round-trip on a leaf)."""
    leaves = jax.tree.leaves(x)
    if leaves:
        np.asarray(jax.device_get(leaves[0]))


@dataclass
class RenderMetrics:
    """Accumulates per-phase timings and ray counts for one render."""

    timers: Dict[str, float] = field(default_factory=dict)
    counters: Dict[str, float] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str, result=None):
        t0 = time.time()
        try:
            yield
        finally:
            self.timers[name] = self.timers.get(name, 0.0) + time.time() - t0

    def timed(self, name: str, fn, *args):
        """Run fn, sync its output, record the wall time; returns result."""
        t0 = time.time()
        out = fn(*args)
        sync(out)
        self.timers[name] = self.timers.get(name, 0.0) + time.time() - t0
        return out

    def count(self, name: str, value: float) -> None:
        self.counters[name] = self.counters.get(name, 0.0) + value

    def rays_per_second(self, rays_key: str = "rays",
                        time_key: str = "render") -> float:
        t = self.timers.get(time_key, 0.0)
        return self.counters.get(rays_key, 0.0) / t if t > 0 else 0.0

    def report(self) -> dict:
        out = {f"time/{k}": round(v, 4) for k, v in self.timers.items()}
        out.update({f"count/{k}": v for k, v in self.counters.items()})
        if "rays" in self.counters and "render" in self.timers:
            out["Mrays_per_s"] = round(self.rays_per_second() / 1e6, 3)
        return out

    def dump(self) -> str:
        return json.dumps(self.report())


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace scope (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def hlo_op_times(trace_dir: str, top: int = 15) -> List[tuple]:
    """Parse a captured trace's chrome-trace file into (op, us) pairs —
    the only honest per-op timing source on the tunneled backend."""
    import glob
    import gzip
    from collections import defaultdict

    files = sorted(
        glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    )
    if not files:
        return []
    j = json.load(gzip.open(files[-1]))
    tot: Dict[str, float] = defaultdict(float)
    for e in j.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            if not name.startswith("$"):
                tot[name] += e["dur"]
    return sorted(tot.items(), key=lambda kv: -kv[1])[:top]
