"""Structured per-frame metrics and timing.

The reference's observability is bare print() progress lines
(traj_ball_renderer.py:384-398).  Here every frame emits a structured
record (stage timings, primitive/point counts) through a pluggable sink;
the batch driver prints a compact line and can dump JSONL for analysis.
jax.profiler tracing can be toggled around the jitted step.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class FrameRecord:
    frame_index: int
    file: str = ""
    points: int = 0
    primitives: int = 0
    timings_s: dict = field(default_factory=dict)
    status: str = "ok"
    error: str = ""

    def line(self) -> str:
        t = " ".join(f"{k}={v * 1e3:.1f}ms" for k, v in self.timings_s.items())
        return (f"[frame {self.frame_index:04d}] {self.status} "
                f"points={self.points} {t}")


class MetricsSink:
    def __init__(self, jsonl_path: Optional[str] = None, quiet: bool = False):
        self.jsonl_path = jsonl_path
        self.quiet = quiet
        self.records = []

    def emit(self, record: FrameRecord):
        self.records.append(record)
        if not self.quiet:
            print(record.line(), flush=True)
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps(record.__dict__) + "\n")

    def summary(self) -> dict:
        ok = [r for r in self.records if r.status == "ok"]
        out = {"frames_ok": len(ok),
               "frames_failed": len(self.records) - len(ok)}
        if ok:
            total = [sum(r.timings_s.values()) for r in ok]
            out["mean_frame_s"] = sum(total) / len(total)
            render = [r.timings_s.get("render", 0.0) for r in ok]
            out["mean_render_s"] = sum(render) / len(render)
        return out


@contextlib.contextmanager
def stage(record: FrameRecord, name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        record.timings_s[name] = time.perf_counter() - t0


@contextlib.contextmanager
def profiler_trace(trace_dir: Optional[str]):
    """Wrap a region in a jax.profiler trace when trace_dir is set."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
