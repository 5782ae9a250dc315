"""Callbacks, events, benchmark & trace instrumentation (reference:
src/callbacks/events.jl, benchmark.jl, trace.jl, stop_early.jl).

Event names mirror the reference's 11 typed events (src/callbacks/events.jl:1-207):
  before_model_creation / after_model_creation
  before_inference / after_inference
  before_iteration / after_iteration    (after_iteration may stop iteration)
  before_data_update / after_data_update
  on_marginal_update
  before_autostart / after_autostart    (streaming engine)
"""

from __future__ import annotations

import time
import uuid
from collections import defaultdict, deque
from typing import Any, Callable, Optional

import numpy as np

EVENT_NAMES = (
    "before_model_creation",
    "after_model_creation",
    "before_inference",
    "after_inference",
    "before_iteration",
    "after_iteration",
    "before_data_update",
    "after_data_update",
    "on_marginal_update",
    "before_autostart",
    "after_autostart",
)


class Event:
    """A lifecycle event with span id pairing before/after (reference
    generate_span_id, src/callbacks/events.jl)."""

    def __init__(self, name: str, payload: Optional[dict] = None,
                 span_id: Optional[str] = None):
        self.name = name
        self.payload = payload or {}
        self.span_id = span_id or uuid.uuid4().hex[:8]
        self.timestamp_ns = time.perf_counter_ns()
        self.stop_iteration = False  # settable by after_iteration handlers

    def __repr__(self):
        return f"Event({self.name}, span={self.span_id})"


class CallbackRegistry:
    def __init__(self, callbacks: Optional[dict] = None):
        self._handlers: dict[str, list[Callable]] = defaultdict(list)
        for name, fn in (callbacks or {}).items():
            if name not in EVENT_NAMES:
                raise ValueError(
                    f"Unknown callback '{name}'; available: {EVENT_NAMES}"
                )
            self.add(name, fn)

    def add(self, name: str, fn: Callable):
        self._handlers[name].append(fn)

    def invoke(self, name: str, **payload) -> Event:
        ev = Event(name, payload)
        for fn in self._handlers.get(name, ()):
            fn(ev)
        return ev

    @property
    def empty(self) -> bool:
        return not any(self._handlers.values())


class BenchmarkCallbacks:
    """Per-stage wall-clock instrumentation (reference RxInferBenchmarkCallbacks,
    src/callbacks/benchmark.jl:62-207): ring buffers of timestamps per event and
    a stats summary (min/max/mean/median/std)."""

    def __init__(self, capacity: int = 1000):
        self.timestamps: dict[str, deque] = defaultdict(lambda: deque(maxlen=capacity))
        self._open_spans: dict[str, int] = {}

    def attach(self, registry: CallbackRegistry):
        for name in EVENT_NAMES:
            registry.add(name, self._record(name))
        return self

    def _record(self, name: str):
        def fn(ev: Event):
            self.timestamps[name].append(ev.timestamp_ns)

        return fn

    def durations_ms(self, start: str, stop: str) -> np.ndarray:
        a = np.asarray(self.timestamps[start], dtype=np.float64)
        b = np.asarray(self.timestamps[stop], dtype=np.float64)
        n = min(len(a), len(b))
        return (b[:n] - a[:n]) / 1e6

    def stats(self) -> dict:
        """min/max/mean/median/std per before/after pair, in ms."""
        out = {}
        for pre, post in (
            ("before_model_creation", "after_model_creation"),
            ("before_inference", "after_inference"),
            ("before_iteration", "after_iteration"),
            ("before_data_update", "after_data_update"),
        ):
            d = self.durations_ms(pre, post)
            if len(d):
                out[pre.replace("before_", "")] = {
                    "n": len(d),
                    "min_ms": float(d.min()),
                    "max_ms": float(d.max()),
                    "mean_ms": float(d.mean()),
                    "median_ms": float(np.median(d)),
                    "std_ms": float(d.std()),
                }
        return out


class profile_trace:
    """Context manager wrapping ``jax.profiler.trace`` — device-level TPU
    profiling around inference calls (SURVEY.md §5: "TPU equivalent: jax
    profiler traces + per-phase host callbacks around compiled steps")::

        with rx.profile_trace("/tmp/tb"):
            rx.infer(...)

    View with TensorBoard's profile plugin."""

    def __init__(self, logdir: str):
        self.logdir = logdir

    def __enter__(self):
        import jax

        jax.profiler.start_trace(self.logdir)
        return self

    def __exit__(self, *exc):
        import jax

        jax.profiler.stop_trace()
        return False


def benchmark_table(bench: "BenchmarkCallbacks") -> str:
    """Plain-text table of per-stage timing stats (reference: PrettyTablesExt
    pretty_table over get_benchmark_stats,
    ext/PrettyTablesExt/PrettyTablesExt.jl:22)."""
    stats = bench.stats()
    if not stats:
        return "(no benchmark samples recorded)"
    header = (f"{'stage':<18}{'n':>6}{'min ms':>10}{'median ms':>11}"
              f"{'mean ms':>10}{'max ms':>10}{'std ms':>9}")
    lines = [header, "-" * len(header)]
    for stage, row in stats.items():
        lines.append(
            f"{stage:<18}{row['n']:>6}{row['min_ms']:>10.3f}"
            f"{row['median_ms']:>11.3f}{row['mean_ms']:>10.3f}"
            f"{row['max_ms']:>10.3f}{row['std_ms']:>9.3f}"
        )
    return "\n".join(lines)


class TraceCallbacks:
    """Record every event with timestamps (reference RxInferTraceCallbacks,
    src/callbacks/trace.jl:60-124); filterable; exportable as JSON."""

    def __init__(self):
        self.events: list[Event] = []

    def attach(self, registry: CallbackRegistry):
        for name in EVENT_NAMES:
            registry.add(name, self.events.append)
        return self

    def traced(self, name: Optional[str] = None) -> list[Event]:
        if name is None:
            return list(self.events)
        return [e for e in self.events if e.name == name]

    def export_json(self, path: str):
        import json

        with open(path, "w") as f:
            json.dump(
                [
                    {"name": e.name, "span": e.span_id, "t_ns": e.timestamp_ns}
                    for e in self.events
                ],
                f,
            )


def convert_to_tensorboard(trace: TraceCallbacks, logdir: str):
    """Write traced events into a TensorBoard log directory (reference:
    TensorBoardLoggerExt.convert_to_tensorboard,
    ext/TensorBoardLoggerExt/TensorBoardLoggerExt.jl:241 — each traced event
    becomes a TB text entry; free-energy values additionally become scalars)."""
    from torch.utils.tensorboard import SummaryWriter

    writer = SummaryWriter(log_dir=logdir)
    try:
        t0 = trace.events[0].timestamp_ns if trace.events else 0
        fe_step = 0
        for step, e in enumerate(trace.events):
            dt_us = (e.timestamp_ns - t0) / 1e3
            writer.add_text(
                f"rxinfer/{e.name}",
                f"span={e.span_id} t+{dt_us:.1f}us payload={e.payload}",
                global_step=step,
            )
            fe = e.payload.get("free_energy")
            if fe is not None:
                writer.add_scalar("rxinfer/free_energy", float(fe), fe_step)
                fe_step += 1
    finally:
        writer.close()


class StopEarlyIterationStrategy:
    """FE-convergence early stopping (reference StopEarlyIterationStrategy,
    src/callbacks/stop_early.jl:20-74): on after_iteration, compare the latest
    free energy against the previous one; set stop_iteration when within tol."""

    def __init__(self, atol: float = 1e-6, rtol: float = 1e-8):
        self.atol = atol
        self.rtol = rtol
        self._prev: Optional[float] = None

    def __call__(self, ev: Event):
        fe = ev.payload.get("free_energy")
        if fe is None:
            return
        fe = float(fe)
        if self._prev is not None:
            if abs(fe - self._prev) <= self.atol + self.rtol * abs(self._prev):
                ev.stop_iteration = True
        self._prev = fe
