"""Profiling helpers.

Role of the reference profiler stack (reference: tensorrt_llm/profiler.py,
NVTX ranges in _utils.py, TLLM_PROFILE_START_STOP iteration windows in
py_executor.py:79). On TPU: jax.profiler traces (XPlane) plus host spans.

Env: ``TLLM_TPU_PROFILE_DIR`` enables tracing;
``TLLM_TPU_PROFILE_START_STOP=start-stop`` bounds it to an iteration
window (consumed by the executor loop).
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Optional

_PROFILE_DIR = os.environ.get("TLLM_TPU_PROFILE_DIR")
_WINDOW = os.environ.get("TLLM_TPU_PROFILE_START_STOP")


def profile_window() -> Optional[tuple]:
    if not _WINDOW:
        return None
    lo, _, hi = _WINDOW.partition("-")
    return int(lo), int(hi or lo)


class IterationProfiler:
    """Start/stop a device trace around an iteration window."""

    def __init__(self):
        self.window = profile_window()
        self._active = False

    def maybe_start(self, iter_counter: int) -> None:
        if (_PROFILE_DIR and self.window and not self._active
                and iter_counter >= self.window[0]):
            import jax
            jax.profiler.start_trace(_PROFILE_DIR)
            self._active = True

    def maybe_stop(self, iter_counter: int) -> None:
        if self._active and iter_counter > self.window[1]:
            import jax
            jax.profiler.stop_trace()
            self._active = False


@contextlib.contextmanager
def host_span(name: str, sink: Optional[Dict[str, float]] = None):
    """Lightweight host timing span (the nvtx_range analog)."""
    t0 = time.monotonic()
    try:
        import jax
        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:
        yield
    finally:
        if sink is not None:
            sink[name] = sink.get(name, 0.0) + (time.monotonic() - t0)


def device_memory_stats() -> dict:
    import jax
    try:
        return dict(jax.devices()[0].memory_stats() or {})
    except Exception:
        return {}


class SpanRecorder:
    """Per-iteration host-phase spans exported as a Chrome trace
    (chrome://tracing / Perfetto JSON). Role of the reference's
    PerfMetricsManager + profiler.py host-side breakdown (reference:
    _torch/pyexecutor/perf_metrics_manager.py:256 — per-iteration
    schedule/forward/sample GPU+CPU timing events): the executor feeds
    one (name, start, dur) triple per loop phase; ``dump`` writes the
    trace and a per-phase total summary.

    Enable with ``TLLM_TPU_HOST_TRACE=/path/trace.json`` — the executor
    records every iteration's sched/dispatch/process phases and writes
    the file at shutdown.
    """

    def __init__(self, path: Optional[str] = None, cap: int = 200_000):
        self.path = path or os.environ.get("TLLM_TPU_HOST_TRACE")
        self.enabled = bool(self.path)
        self.events: list = []
        self.totals: Dict[str, float] = {}
        self.cap = cap
        self._t0 = time.monotonic()

    def record(self, name: str, start_s: float, dur_s: float,
               iter_id: int = 0) -> None:
        if not self.enabled:
            return
        self.totals[name] = self.totals.get(name, 0.0) + dur_s
        if len(self.events) < self.cap:
            self.events.append({
                "name": name, "ph": "X", "pid": 0, "tid": 0,
                "ts": (start_s - self._t0) * 1e6,
                "dur": dur_s * 1e6,
                "args": {"iter": iter_id}})

    def dump(self) -> Optional[str]:
        if not self.enabled or not self.events:
            return None
        import json
        payload = {"traceEvents": self.events,
                   "metadata": {"totals_s": {
                       k: round(v, 4) for k, v in self.totals.items()}}}
        try:
            with open(self.path, "w") as f:
                json.dump(payload, f)
            return self.path
        except OSError:
            return None
