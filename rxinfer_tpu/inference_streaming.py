"""Streaming inference engine (reference: RxInferenceEngine + @autoupdates,
src/inference/streaming.jl, src/inference/autoupdates.jl).

The reference's reactive executor is replaced by a compiled *step function*:
posteriors→priors feedback (`autoupdates`) is a pure function
``new_prior_args = f(posteriors)`` (the reference's own semantics,
src/inference/autoupdates.jl:614-659), so an observation step is
``args' = step(args, observation)`` — jitted once, then driven either by a
Python event loop (true streaming, `on_next`) or by ``lax.scan`` over a whole
observation array (`run_offline` — full device throughput with zero host
round-trips per step).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .engine.compile import CompiledModel


class autoupdates:
    """Posterior→prior feedback spec (the reference @autoupdates).

    Example:
        au = autoupdates(
            initial={"pm": m0, "pc": P0},
            pm=lambda q: q["x"].mean(),
            pc=lambda q: q["x"].cov(),
        )
    ``initial`` provides the first tick's data-argument values (the reference
    fetches these from @initialization-set marginals)."""

    def __init__(self, initial: Optional[dict] = None, **mapping: Callable[[dict], Any]):
        self.mapping = dict(mapping)
        self.initial = {
            k: jnp.asarray(v, jnp.float32) for k, v in (initial or {}).items()
        }
        missing = sorted(set(self.mapping) - set(self.initial))
        if missing:
            # reference UX: "The initial value for `θ` has not been specified,
            # but is required in the `@autoupdates`."
            # (test/models/iid/beta_bernoulli_tests.jl:37-42)
            raise ValueError(
                f"The initial value for {missing} has not been specified, but "
                "is required in the autoupdates. Pass initial={...} covering "
                "every autoupdated argument."
            )

    def __call__(self, posteriors: dict, messages=None) -> dict:
        """Apply the mapping.  A mapping function declaring TWO positional
        parameters receives ``(q, mu)`` where ``mu[name]`` is the variable's
        recent outbound message (reference μ(x) autoupdate arguments,
        src/inference/autoupdates.jl:588-610)."""
        import inspect

        out = {}
        for k, fn in self.mapping.items():
            try:
                # Count only REQUIRED positional params: closure-capture
                # defaults (``lambda q, k=k: ...``) must not be mistaken for a
                # μ-messages parameter.
                nargs = len([
                    p for p in inspect.signature(fn).parameters.values()
                    if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
                    and p.default is p.empty
                ])
            except (TypeError, ValueError):
                nargs = 1
            val = fn(posteriors, messages) if nargs >= 2 else fn(posteriors)
            out[k] = jnp.asarray(val, jnp.float32)
        return out


class _MessageFetch:
    """Lazy μ(x) resolver handed to two-argument autoupdate mappings."""

    def __init__(self, compiled, state, data):
        self._compiled = compiled
        self._state = state
        self._data = data

    def __getitem__(self, name):
        return self._compiled.variable_outbound_message(
            self._state, self._data, name
        )


class RxInferenceEvent:
    def __init__(self, name: str, payload=None):
        self.name = name
        self.payload = payload

    def __repr__(self):
        return f"RxInferenceEvent({self.name})"


class RxInferenceEngine:
    """Streaming engine: holds the compiled single-step program and the current
    autoupdate arguments; `on_next(obs)` performs one tick (the reference's
    executor on_next!, src/inference/streaming.jl:311-436)."""

    def __init__(self, model, autoupdates_spec: autoupdates,
                 iterations: int = 1, free_energy: bool = False,
                 keephistory: int = 0, options: Optional[dict] = None,
                 event_callbacks: Optional[dict] = None,
                 initialization: Optional[dict] = None,
                 uselock=False):
        self.model = model
        self.autoupdates = autoupdates_spec
        self.args = dict(autoupdates_spec.initial)
        self.iterations = iterations
        self.free_energy = free_energy
        self.keephistory = keephistory
        self.options = options
        self.initialization = initialization
        self.history: list[dict] = []
        self.fe_history: list = []
        self.posteriors: Optional[dict] = None
        self._compiled: Optional[CompiledModel] = None
        self.events: list[RxInferenceEvent] = []
        self._callbacks = event_callbacks or {}
        self.is_running = False
        self.is_errored = False
        # opt-in tick serialization against concurrent producers (reference
        # `uselock` SpinLock, src/inference/streaming.jl:560,802-810); pass
        # True for a fresh lock or an existing lock object to share one.
        import threading

        self._lock = (threading.Lock() if uselock is True else uselock) \
            if uselock else None

    def _fire(self, name: str, payload=None):
        ev = RxInferenceEvent(name, payload)
        self.events.append(ev)
        cb = self._callbacks.get(name)
        if cb:
            cb(ev)

    def _ensure_compiled(self, obs: dict):
        if self._compiled is None:
            data = {**obs, **self.args}
            graph = self.model.trace(data)
            self._compiled = CompiledModel(
                graph, init=self.initialization, options=self.options
            )

    def on_next(self, obs: dict):
        """Process one observation: run autoupdates-fed inference step
        (reference executor on_next!, src/inference/streaming.jl:311-436;
        event set mirrors the engine events at :847-866)."""
        if self._lock is not None:
            with self._lock:
                return self._on_next(obs)
        return self._on_next(obs)

    def _on_next(self, obs: dict):
        # Event set = the reference engine's 16 events
        # (src/inference/streaming.jl:847-866).  The VMP iterations run inside
        # ONE compiled program, so the per-iteration pairs fire once per tick.
        self._ensure_compiled(obs)
        self._fire("on_new_data", obs)
        self._fire("before_iteration")
        self._fire("before_data_update", obs)
        data = {**obs, **self.args}
        state, fe, _ = self._compiled.run(
            data, iterations=self.iterations, free_energy=self.free_energy
        )
        from .inference import _extract_posteriors

        self.posteriors = _extract_posteriors(self._compiled, state)
        self._fire("on_marginal_update", self.posteriors)
        self._fire("after_data_update", obs)
        self._fire("after_iteration")
        self._fire("before_auto_update")
        self.args = self.autoupdates(
            self.posteriors,
            _MessageFetch(self._compiled, state,
                          {k: jnp.asarray(v) for k, v in data.items()}),
        )
        self._fire("after_auto_update")
        if self.free_energy:
            self.fe_history.append(fe)
        if self.keephistory:
            self._fire("before_history_save")
            self.history.append(self.posteriors)
            if len(self.history) > self.keephistory:
                self.history.pop(0)
            self._fire("after_history_save")
        self._fire("on_tick")
        return self.posteriors

    def run_offline(self, observations: dict):
        """Offline fast path: scan the compiled step over whole observation
        arrays (dict name -> (T, ...)); returns stacked per-step posteriors.

        This is the TPU-native equivalent of feeding the reference engine a
        complete static datastream (src/inference/streaming.jl:562-575) — one
        compiled ``lax.scan``, no host round-trips."""
        first = {k: jnp.asarray(v[0], jnp.float32) for k, v in observations.items()}
        self._ensure_compiled(first)
        compiled = self._compiled
        program = compiled.make_program(self.iterations, self.free_energy, False)
        au = self.autoupdates

        from .inference import _extract_posteriors

        def step(args, obs_t):
            data_t = {**obs_t, **args}
            state, fe, _ = program(data_t)
            post = _extract_posteriors(compiled, state)
            return au(post, _MessageFetch(compiled, state, data_t)), (post, fe)

        obs_arrays = {
            k: jnp.asarray(np.asarray(v), jnp.float32) for k, v in observations.items()
        }
        final_args, (posts, fes) = jax.lax.scan(step, dict(self.args), obs_arrays)
        self.args = {k: v for k, v in final_args.items()}
        return posts, fes

    # -- lifecycle (reference: start/stop, events) --------------------------------
    def start(self, datastream: Iterable[dict]):
        self.is_running = True
        self._fire("before_autostart")
        self._fire("before_start")
        self._fire("after_start")
        completed = False
        try:
            for obs in datastream:
                if not self.is_running:
                    break
                self.on_next(obs)
            completed = self.is_running
        except Exception:
            self.is_errored = True
            self._fire("on_error")
            raise
        finally:
            if completed:
                self._fire("on_complete")
            self._fire("after_autostart")
        return self

    def stop(self):
        self._fire("before_stop")
        self.is_running = False
        self._fire("after_stop")


def streaming_infer(model, datastream, autoupdates, initialization=None,
                    iterations=1, free_energy=False, keephistory=0,
                    options=None, uselock=False):
    """Streaming dispatch target of `infer` (reference
    src/inference/inference.jl:700-731)."""
    if autoupdates is None:
        raise ValueError("streaming inference requires autoupdates=")
    engine = RxInferenceEngine(
        model, autoupdates, iterations=iterations,
        free_energy=free_energy, keephistory=keephistory, options=options,
        initialization=initialization, uselock=uselock,
    )
    if datastream is not None:
        engine.start(datastream)
    return engine
