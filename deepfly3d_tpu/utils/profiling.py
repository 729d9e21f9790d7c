"""Per-stage timing and JAX profiler integration.

The reference's observability is tqdm progress bars and one printed
reprojection error (SURVEY §5.1/§5.5).  Here every pipeline stage can be
timed with a ``StageTimer`` (wall time + derived frames/sec), and a device
trace can be captured around any region with ``trace_to`` for analysis in
TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional


class StageTimer:
    """Accumulates wall-clock per named stage; reports a metrics dict."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def metrics(self, frames: Optional[int] = None) -> dict:
        out = {
            name: {
                "seconds": round(self.totals[name], 4),
                "calls": self.counts[name],
            }
            for name in self.totals
        }
        if frames:
            total = sum(self.totals.values())
            out["_summary"] = {
                "total_seconds": round(total, 4),
                "frames": frames,
                "frames_per_sec": round(frames / total, 2) if total else None,
            }
        return out

    def report(self, frames: Optional[int] = None) -> str:
        return json.dumps(self.metrics(frames), indent=2)


@contextlib.contextmanager
def trace_to(logdir: str):
    """Capture a JAX device trace around the enclosed region."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
