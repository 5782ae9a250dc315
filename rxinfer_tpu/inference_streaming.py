"""Streaming inference engine (reference: RxInferenceEngine + @autoupdates,
src/inference/streaming.jl, src/inference/autoupdates.jl).

The reference's reactive executor is replaced by a compiled *step function*:
posteriors→priors feedback (`autoupdates`) is a pure function
``new_prior_args = f(posteriors)`` (the reference's own semantics,
src/inference/autoupdates.jl:614-659), so an observation step is
``state' = step(state, observation)`` — jitted once, then driven either by a
Python event loop (true streaming) or by ``lax.scan`` over a whole observation
array (offline filtering at full device throughput; see engine/filtering.py for
the batched multi-chain fast path).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .engine.compile import CompiledModel


class autoupdates:
    """Mapping from data-argument names to functions of the posterior dict.

    Example (reference @autoupdates equivalent):
        au = autoupdates(
            prior_mean=lambda q: q["x"].mean(),
            prior_var=lambda q: q["x"].var(),
        )
    """

    def __init__(self, **mapping: Callable[[dict], Any]):
        self.mapping = dict(mapping)

    def __call__(self, posteriors: dict) -> dict:
        return {k: fn(posteriors) for k, fn in self.mapping.items()}


class RxInferenceEngine:
    """Streaming engine: holds the compiled single-step program and the current
    autoupdate arguments; `on_next(obs)` performs one tick (the reference's
    executor on_next!, src/inference/streaming.jl:311-436)."""

    def __init__(self, model, autoupdates_spec: autoupdates, initial_args: dict,
                 iterations: int = 1, free_energy: bool = False,
                 keephistory: int = 0, options: Optional[dict] = None):
        self.model = model
        self.autoupdates = autoupdates_spec
        self.args = dict(initial_args)
        self.iterations = iterations
        self.free_energy = free_energy
        self.keephistory = keephistory
        self.options = options
        self.history: list[dict] = []
        self.fe_history: list = []
        self.posteriors: Optional[dict] = None
        self._compiled: Optional[CompiledModel] = None
        self.events: list[str] = []
        self.is_running = False
        self.is_errored = False

    def _ensure_compiled(self, obs: dict):
        if self._compiled is None:
            data = {**obs, **self.args}
            graph = self.model.trace(data)
            self._compiled = CompiledModel(graph, options=self.options)

    def on_next(self, obs: dict):
        """Process one observation: run autoupdates-fed inference step."""
        self._ensure_compiled(obs)
        data = {**obs, **self.args}
        state, fe, _ = self._compiled.run(
            data, iterations=self.iterations, free_energy=self.free_energy
        )
        from .inference import _extract_posteriors

        self.posteriors = _extract_posteriors(self._compiled, state)
        self.args = {
            k: jnp.asarray(v, jnp.float32)
            for k, v in self.autoupdates(self.posteriors).items()
        }
        if self.free_energy:
            self.fe_history.append(fe)
        if self.keephistory:
            self.history.append(self.posteriors)
            if len(self.history) > self.keephistory:
                self.history.pop(0)
        return self.posteriors

    # -- lifecycle (reference: start/stop, events) --------------------------------
    def start(self, datastream: Iterable[dict]):
        self.is_running = True
        self.events.append("before_autostart")
        try:
            for obs in datastream:
                if not self.is_running:
                    break
                self.on_next(obs)
        except Exception:
            self.is_errored = True
            self.events.append("on_error")
            raise
        finally:
            self.events.append("after_autostart")
        return self

    def stop(self):
        self.is_running = False


def streaming_infer(model, datastream, autoupdates, initialization=None,
                    iterations=1, free_energy=False, keephistory=0, options=None,
                    initial_args: Optional[dict] = None):
    """Streaming dispatch target of `infer` (reference
    src/inference/inference.jl:700-731)."""
    if autoupdates is None:
        raise ValueError("streaming inference requires autoupdates=")
    engine = RxInferenceEngine(
        model, autoupdates, initial_args or {}, iterations=iterations,
        free_energy=free_energy, keephistory=keephistory, options=options,
    )
    if datastream is not None:
        engine.start(datastream)
    return engine
