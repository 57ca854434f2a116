"""Tracing + perf counters.

TPU equivalents of the reference's observability kit:
  - PerfettoTrace singleton (reference src/core/perfetto_trace.hpp:24-100):
    here backed by jax.profiler (traces load into Perfetto UI /
    TensorBoard); same start/stop + begin/end span surface, same span
    names used at the same call sites (draft forward, verify, logits
    copy) so dashboards port over.
  - /proc perf counters (reference src/core/perf.hpp:11-95): CPU times,
    IO bytes, RSS/VMS snapshots logged at init stages.
"""

from __future__ import annotations

import contextlib
import os
import time
from dataclasses import dataclass

from .logging import get_logger

log = get_logger("trace")


class Trace:
    """jax.profiler-backed span tracing (reference PerfettoTrace)."""

    _active = False
    _dir: str | None = None

    @classmethod
    def start_tracing(cls, trace_dir: str = "/tmp/powerserve_trace") -> None:
        import jax

        if cls._active:
            return
        os.makedirs(trace_dir, exist_ok=True)
        jax.profiler.start_trace(trace_dir)
        cls._active = True
        cls._dir = trace_dir
        log.info(f"tracing -> {trace_dir}")

    @classmethod
    def stop_tracing(cls) -> str | None:
        import jax

        if not cls._active:
            return None
        jax.profiler.stop_trace()
        cls._active = False
        log.info(f"trace written to {cls._dir}")
        return cls._dir

    @staticmethod
    @contextlib.contextmanager
    def span(name: str):
        """Named span (usable whether or not tracing is active)."""
        import jax

        with jax.profiler.TraceAnnotation(name):
            yield

    # reference span names (token_tree.cpp:145, qnn_backend.cpp:91-103)
    SPAN_DRAFT_FORWARD = "draft_decode"
    SPAN_TARGET_FORWARD = "target_forward"
    SPAN_VERIFY = "tree_verify"
    SPAN_PREFILL = "prefill"
    SPAN_DECODE = "decode_step"
    SPAN_LOGITS = "copy_logits"


@dataclass
class PerfSnapshot:
    """One /proc sample (reference perf.cpp)."""

    utime_s: float = 0.0
    stime_s: float = 0.0
    read_bytes: int = 0
    write_bytes: int = 0
    vms_mb: float = 0.0
    rss_mb: float = 0.0
    wall_s: float = 0.0

    @classmethod
    def capture(cls) -> "PerfSnapshot":
        snap = cls(wall_s=time.time())
        try:
            with open("/proc/self/stat") as f:
                parts = f.read().split()
            tick = os.sysconf("SC_CLK_TCK")
            snap.utime_s = int(parts[13]) / tick
            snap.stime_s = int(parts[14]) / tick
            page = os.sysconf("SC_PAGE_SIZE")
            snap.vms_mb = int(parts[22]) / 1e6
            snap.rss_mb = int(parts[23]) * page / 1e6
        except OSError:
            pass
        try:
            with open("/proc/self/io") as f:
                for line in f:
                    k, _, v = line.partition(":")
                    if k == "read_bytes":
                        snap.read_bytes = int(v)
                    elif k == "write_bytes":
                        snap.write_bytes = int(v)
        except OSError:
            pass
        return snap

    def delta(self, since: "PerfSnapshot") -> str:
        return (f"cpu {self.utime_s - since.utime_s:.2f}u/"
                f"{self.stime_s - since.stime_s:.2f}s "
                f"io {(self.read_bytes - since.read_bytes) / 1e6:.1f}MB r/"
                f"{(self.write_bytes - since.write_bytes) / 1e6:.1f}MB w "
                f"rss {self.rss_mb:.0f}MB "
                f"wall {self.wall_s - since.wall_s:.2f}s")


def log_perf(stage: str, since: PerfSnapshot | None = None) -> PerfSnapshot:
    """Log a perf snapshot at an init stage (reference run.cpp:29,58,70)."""
    now = PerfSnapshot.capture()
    if since is not None:
        log.info(f"[perf] {stage}: {now.delta(since)}")
    else:
        log.info(f"[perf] {stage}: rss {now.rss_mb:.0f}MB")
    return now
