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

Kwarg surface parity (reference src/inference/streaming.jl:536-845):
constraints/meta flow into the compiled model; returnvars selects the exposed
posteriors; historyvars/keephistory control the per-tick history buffers;
callbacks/events, annotations/postprocess, benchmark/trace, and session are
all honored.  When per-iteration event callbacks are registered the tick runs
in host-loop mode — one compiled sweep per iteration — so before/after
_iteration fire per VMP iteration and ``stop_iteration`` terminates the loop
early (reference streaming.jl:349-407); otherwise all iterations run inside
one compiled program and the pairs fire once per tick.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .engine.compile import CompiledModel, as_f32_device

# events whose registration forces host-loop (per-iteration) tick execution
_PER_ITERATION_EVENTS = ("before_iteration", "after_iteration")

ENGINE_EVENTS = (
    "on_new_data", "before_iteration", "before_auto_update",
    "after_auto_update", "before_data_update", "on_marginal_update",
    "after_data_update", "after_iteration", "before_history_save",
    "after_history_save", "on_tick", "on_error", "on_complete",
    "before_autostart", "after_autostart", "before_start", "after_start",
    "before_stop", "after_stop", "before_model_creation",
    "after_model_creation",
)


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
        if not mapping:
            # reference: "`@autoupdates` did not find any auto-updates
            # specifications" (test/inference/autoupdates_tests.jl:249-254)
            raise ValueError(
                "autoupdates() did not find any auto-update specifications; "
                "pass keyword mappings, e.g. autoupdates(initial={'a': ...}, "
                "a=lambda q: q['theta'].mean())."
            )
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
        """Apply the mapping.  A mapping function declaring TWO required
        positional parameters receives ``(q, mu)`` where ``mu[name]`` is the
        variable's recent outbound message (reference μ(x) autoupdate
        arguments, src/inference/autoupdates.jl:588-610)."""
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

    def __init__(self, compiled, state, data, batched: bool = False):
        self._compiled = compiled
        self._state = state
        self._data = data
        self._batched = batched

    def __getitem__(self, name):
        if self._batched:
            return jax.vmap(
                lambda st, d: self._compiled.variable_outbound_message(
                    st, d, name)
            )(self._state, self._data)
        return self._compiled.variable_outbound_message(
            self._state, self._data, name
        )


def _shard_map_fn(fn, mesh, mesh_axis, in_specs, out_specs):
    """shard_map with the repo-wide compat shim (check_vma/check_rep)."""
    try:
        from jax import shard_map

        kw = {"check_vma": False}  # pallas outputs carry no vma
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

        kw = {"check_rep": False}
    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     **kw)


class RxInferenceEvent:
    def __init__(self, name: str, payload=None):
        self.name = name
        self.payload = payload
        self.timestamp_ns = time.perf_counter_ns()
        self.span_id = f"{id(self) & 0xffffffff:08x}"
        self.stop_iteration = False  # settable by after_iteration handlers

    def __repr__(self):
        return f"RxInferenceEvent({self.name})"


class RxInferenceEngine:
    """Streaming engine: holds the compiled single-step program and the current
    autoupdate arguments; `on_next(obs)` performs one tick (the reference's
    executor on_next!, src/inference/streaming.jl:311-436)."""

    def __init__(self, model, autoupdates_spec: autoupdates,
                 iterations: int = 1, free_energy: bool = False,
                 free_energy_diagnostics="default",
                 keephistory: int = 0, options: Optional[dict] = None,
                 event_callbacks: Optional[dict] = None,
                 initialization: Optional[dict] = None,
                 constraints: Any = None, meta: Any = None,
                 returnvars: Any = None, historyvars: Any = None,
                 annotations: Any = None, postprocess: Any = None,
                 uselock=False, warn: bool = True,
                 allow_node_contraction: bool = False,
                 batched: bool = False, mesh: Any = None,
                 mesh_axis: str = "dp"):
        self.model = model
        self.allow_node_contraction = allow_node_contraction
        # Continuous batching (BASELINE config 5): every observation and every
        # autoupdated argument carries a leading batch axis (B independent
        # streams); the model is traced on stream 0 and the per-tick program
        # is vmapped over the batch.  With ``mesh=`` the batch axis is
        # sharded along ``mesh_axis`` via shard_map — pure DP, zero
        # collectives in steady state (SURVEY §2.3; the reference has no
        # equivalent, src/inference/streaming.jl is one stream per engine).
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        if mesh is not None and mesh_axis not in dict(
                getattr(mesh, "shape", {})):
            raise ValueError(
                f"streaming inference shards the BATCH of parallel streams: "
                f"the mesh needs a {mesh_axis!r} axis (got "
                f"{tuple(mesh.axis_names)}). Time sharding "
                "(mesh=Mesh(..., ('time',))) is batch-mode only — see "
                "rx.infer(data=..., mesh=...)."
            )
        self._batched = bool(batched) or mesh is not None
        self.autoupdates = autoupdates_spec
        self.args = dict(autoupdates_spec.initial)
        self.iterations = iterations
        self.free_energy = free_energy
        self.free_energy_diagnostics = free_energy_diagnostics
        self.keephistory = keephistory
        self.options = options
        self.initialization = initialization
        self.constraints = constraints
        self.meta = meta
        self.returnvars = returnvars
        self.annotations = annotations
        self.postprocess = postprocess
        self.history: list[dict] = []
        self.fe_history: list = []
        self.posteriors: Optional[dict] = None
        self._compiled: Optional[CompiledModel] = None
        self._stream_plan = None  # None=untried, False=ineligible, or plan
        # persistent per-engine marginal carry (state, chain_cross):
        # reference parity — marginal streams keep their latest values across
        # observations; only autoupdated priors change per tick
        # (src/inference/streaming.jl:311-436)
        self._carry = None
        self._jitted: dict = {}
        self.events: list[RxInferenceEvent] = []
        # name -> list of handlers; plus recorders receiving EVERY event
        self._callbacks: dict[str, list] = {}
        for name, cb in (event_callbacks or {}).items():
            if name not in ENGINE_EVENTS:
                raise ValueError(
                    f"Unknown streaming event '{name}'; available: "
                    f"{ENGINE_EVENTS}"
                )
            self._callbacks.setdefault(name, []).extend(
                cb if isinstance(cb, (list, tuple)) else [cb]
            )
        self._recorders: list = []
        # historyvars semantics (reference streaming.jl:737-763): requires
        # keephistory > 0; global KeepEach/KeepLast applies to all returned
        # vars; dict is per-variable; default (with keephistory) = KeepLast.
        from .inference import KeepEach, KeepLast

        if historyvars is not None and not keephistory:
            if warn:
                import warnings

                warnings.warn(
                    "`historyvars` requires `keephistory > 0`; ignoring "
                    "(reference parity: src/inference/streaming.jl:761-763).",
                    stacklevel=3,
                )
            historyvars = None
        self._historyvars = historyvars
        self._need_keep_each = bool(keephistory) and (
            isinstance(historyvars, KeepEach)
            or (isinstance(historyvars, dict)
                and any(isinstance(v, KeepEach) for v in historyvars.values()))
        )
        self.is_running = False
        self.is_errored = False
        # opt-in tick serialization against concurrent producers (reference
        # `uselock` SpinLock, src/inference/streaming.jl:560,802-810); pass
        # True for a fresh lock or an existing lock object to share one.
        import threading

        self._lock = (threading.Lock() if uselock is True else uselock) \
            if uselock else None

    def _fire(self, name: str, payload=None) -> RxInferenceEvent:
        ev = RxInferenceEvent(name, payload)
        self.events.append(ev)
        for rec in self._recorders:
            rec(ev)
        for cb in self._callbacks.get(name, ()):
            cb(ev)
        return ev

    @property
    def _host_loop(self) -> bool:
        return any(self._callbacks.get(n) for n in _PER_ITERATION_EVENTS)

    def _ensure_compiled(self, obs: dict):
        if self._compiled is None:
            self._fire("before_model_creation")
            data = {**obs, **self.args}
            if self._batched:
                # trace the SINGLE-stream model on batch element 0
                data = {k: np.asarray(v)[0] for k, v in data.items()}
            graph = self.model.trace(
                data, allow_node_contraction=self.allow_node_contraction)
            self._compiled = CompiledModel(
                graph, init=self.initialization, options=self.options,
                constraints=self.constraints, meta=self.meta,
            )
            self._carry = None
            self._fire("after_model_creation")

    def _check_batch(self, data: dict) -> int:
        batch = int(np.asarray(next(iter(data.values()))).shape[0])
        if self.mesh is not None:
            n_dev = int(self.mesh.shape[self.mesh_axis])
            if batch % n_dev != 0:
                raise ValueError(
                    f"streaming mesh: batch {batch} must be divisible by "
                    f"the {self.mesh_axis!r} axis size {n_dev}."
                )
        return batch

    def _batched_tick_fn(self, cold: bool):
        """Jitted batched tick: vmap of the single-stream tick program over
        the leading batch axis, shard_mapped over ``mesh_axis`` when a mesh
        is attached (every input/output leaf is batch-leading, so one
        PartitionSpec prefix shards the whole pytree)."""
        key = ("btick", cold, self.iterations, self.free_energy,
               self._need_keep_each)
        if key not in self._jitted:
            prog = self._compiled.make_tick_program(
                self.iterations, self.free_energy, self._need_keep_each,
                cold=cold)
            fn = jax.vmap(prog)
            if self.mesh is not None:
                from jax.sharding import PartitionSpec as P

                spec = P(self.mesh_axis)
                n_in = 1 if cold else 3
                fn = _shard_map_fn(fn, self.mesh, self.mesh_axis,
                                   in_specs=(spec,) * n_in, out_specs=spec)
            self._jitted[key] = jax.jit(fn)
        return self._jitted[key]

    def _extract(self, state: dict) -> dict:
        from .inference import _extract_posteriors

        out = _extract_posteriors(self._compiled, state)
        if self.returnvars is not None:
            names = (list(self.returnvars) if not isinstance(self.returnvars, str)
                     else [self.returnvars])
            out = {k: v for k, v in out.items() if k in names}
        return out

    def _postprocess(self, posteriors: dict, fe) -> dict:
        from .postprocess import (
            Marginal,
            default_postprocess,
            inference_postprocess,
        )

        strategy = (self.postprocess if self.postprocess is not None
                    else default_postprocess(self.annotations))
        if self.annotations is not None and fe is not None and jnp.size(fe):
            wrap = lambda d: Marginal(d, {"log_scale": -fe[-1]})
        else:
            wrap = lambda d: d
        return {k: inference_postprocess(strategy, wrap(v))
                for k, v in posteriors.items()}

    def on_next(self, obs: dict):
        """Process one observation: run autoupdates-fed inference step
        (reference executor on_next!, src/inference/streaming.jl:311-436;
        event set mirrors the engine events at :847-866)."""
        clash = sorted(set(obs) & set(self.args))
        if clash:
            # reference: "`a` is present both in the `data` and in the
            # `autoupdates`." (test/inference/inference_tests.jl:1489-1514)
            raise ValueError(
                f"`{clash[0]}` is present both in the `data` and in the "
                "`autoupdates`."
            )
        if self._lock is not None:
            with self._lock:
                return self._on_next(obs)
        return self._on_next(obs)

    def _tick_compiled(self, data: dict, obs: dict):
        """All VMP iterations inside one compiled program; the per-iteration
        event pairs fire once per tick (documented divergence — register a
        before/after_iteration callback to get true per-iteration events)."""
        self._fire("before_iteration", {"iteration": 0})
        # reference tick order (streaming.jl:349-407): the autoupdate fetched
        # at tick start is APPLIED between before_iteration and
        # before_data_update — here application = the args already merged
        # into `data` (computed from the previous tick's posteriors).
        self._fire("before_auto_update")
        self._fire("after_auto_update")
        self._fire("before_data_update", obs)
        if self._batched:
            data_j = {k: as_f32_device(v)
                      for k, v in data.items()}
            if self.mesh is not None:
                # pin the tick inputs' sharding (see _run_offline_batched:
                # mixed sharded/unsharded inputs force silent recompiles)
                from jax.sharding import NamedSharding, PartitionSpec as P

                sh = NamedSharding(self.mesh, P(self.mesh_axis))
                data_j = {k: jax.device_put(v, sh)
                          for k, v in data_j.items()}
            self._check_batch(data_j)
            cold = self._carry is None
            fn = self._batched_tick_fn(cold)
            with self._compiled._prec_ctx():
                if cold:
                    state, fe, history_states, cross = fn(data_j)
                else:
                    state, fe, history_states, cross = fn(
                        data_j, self._carry[0], self._carry[1])
            self._carry = (state, cross)
        else:
            state, fe, history_states, self._carry = self._compiled.run_tick(
                data, iterations=self.iterations,
                free_energy=self.free_energy,
                keep_each=self._need_keep_each, carry=self._carry,
            )
        raw = self._extract(state)
        self.posteriors = self._postprocess(raw, fe if self.free_energy
                                            else None)
        self._fire("on_marginal_update", self.posteriors)
        self._fire("after_data_update", obs)
        self._fire("after_iteration", {"iteration": self.iterations - 1})
        return state, raw, fe, history_states

    def _tick_host_loop(self, data: dict, obs: dict):
        """One compiled sweep per VMP iteration with true per-iteration
        events and ``stop_iteration`` support (reference
        streaming.jl:349-407)."""
        compiled = self._compiled
        key = ("sweep", self.free_energy, self._batched)
        if key not in self._jitted:
            sweep = compiled.make_sweep_fn(self.free_energy)
            if self._batched:
                sweep = jax.vmap(sweep)
                if self.mesh is not None:
                    from jax.sharding import PartitionSpec as P

                    spec = P(self.mesh_axis)
                    sweep = _shard_map_fn(sweep, self.mesh, self.mesh_axis,
                                          in_specs=(spec, spec),
                                          out_specs=spec)
            self._jitted[key] = jax.jit(sweep)
        fn = self._jitted[key]
        data_j = {k: as_f32_device(v)
                  for k, v in data.items()}
        if self._carry is not None:
            carry = self._carry
        elif self._batched:
            batch = self._check_batch(data_j)
            state0 = compiled._init_state()
            carry = (jax.tree_util.tree_map(
                lambda a: jnp.broadcast_to(a, (batch,) + jnp.shape(a)),
                state0), {})
        else:
            carry = (compiled._init_state(), {})
        fes, history_states = [], []
        for i in range(self.iterations):
            self._fire("before_iteration", {"iteration": i})
            self._fire("before_auto_update")
            self._fire("after_auto_update")
            self._fire("before_data_update", obs)
            carry, fe = fn(carry, data_j)
            self._fire("on_marginal_update")
            self._fire("after_data_update", obs)
            if self.free_energy:
                fes.append(fe)
            if self._need_keep_each:
                history_states.append(dict(carry[0]))
            ev = self._fire("after_iteration", {
                "iteration": i,
                "free_energy": (
                    (np.asarray(fe) if self._batched else float(fe))
                    if self.free_energy else None),
            })
            if ev.stop_iteration:
                break
        fe_arr = jnp.stack(fes) if fes else jnp.zeros((0,))
        self._carry = carry  # persistent marginals across ticks
        state = carry[0]
        raw = self._extract(state)
        self.posteriors = self._postprocess(
            raw, fe_arr if self.free_energy else None)
        return state, raw, fe_arr, history_states

    def _on_next(self, obs: dict):
        # Event set = the reference engine's events
        # (src/inference/streaming.jl:847-866).
        self._ensure_compiled(obs)
        self._fire("on_new_data", obs)
        data = {**obs, **self.args}
        if self._host_loop:
            state, raw, fe, history_states = self._tick_host_loop(data, obs)
        else:
            state, raw, fe, history_states = self._tick_compiled(data, obs)
        # compute next tick's autoupdate args from this tick's posteriors
        # (the reference prefetches at the NEXT tick's start — identical
        # values; events around the application fire inside the tick above)
        self.args = self.autoupdates(
            raw,
            _MessageFetch(self._compiled, state,
                          {k: jnp.asarray(v) for k, v in data.items()},
                          batched=self._batched),
        )
        if self.free_energy:
            from .diagnostics import (
                DefaultObjectiveDiagnosticChecks,
                apply_fe_diagnostics,
            )

            checks = (DefaultObjectiveDiagnosticChecks
                      if self.free_energy_diagnostics == "default"
                      else self.free_energy_diagnostics)
            apply_fe_diagnostics(checks, fe)
            self.fe_history.append(fe)
        if self.keephistory:
            self._fire("before_history_save")
            self.history.append(
                self._history_entry(raw, history_states, fe))
            if len(self.history) > self.keephistory:
                self.history.pop(0)
            self._fire("after_history_save")
        self._fire("on_tick")
        return self.posteriors

    def _history_entry(self, raw: dict, history_states: list, fe):
        from .inference import KeepEach

        hv = self._historyvars
        entry = {}
        for name, final in raw.items():
            opt = (hv.get(name) if isinstance(hv, dict) else hv)
            if isinstance(hv, dict) and name not in hv:
                continue
            if isinstance(opt, KeepEach) and history_states:
                entry[name] = [self._extract(hs)[name]
                               for hs in history_states]
            else:
                entry[name] = final
        return entry

    def run_offline(self, observations: dict):
        """Offline fast path: scan the compiled step over whole observation
        arrays (dict name -> (T, ...)); returns stacked per-step posteriors.

        This is the TPU-native equivalent of feeding the reference engine a
        complete static datastream (src/inference/streaming.jl:562-575) — one
        compiled ``lax.scan``, no host round-trips.

        In batched mode (``batched=True`` / ``mesh=``) every observation
        array is (T, B, ...): B independent streams advance in lockstep —
        continuous batching — and with a mesh the batch axis is sharded via
        shard_map (BASELINE config 5 through the engine surface)."""
        if self._batched:
            return self._run_offline_batched(observations)
        first = {k: jnp.asarray(v[0], jnp.float32) for k, v in observations.items()}
        self._ensure_compiled(first)
        compiled = self._compiled
        cold = compiled.make_tick_program(
            self.iterations, self.free_energy, False, cold=True)
        warm = compiled.make_tick_program(
            self.iterations, self.free_energy, False, cold=False)
        au = self.autoupdates

        from .inference import _extract_posteriors

        obs_arrays = {
            k: as_f32_device(v) for k, v in observations.items()
        }
        # tick 0: cold start from the initialization; later ticks warm-start
        # from the previous tick's marginals (persistent streams, reference
        # src/inference/streaming.jl:311-436)
        obs0 = {k: v[0] for k, v in obs_arrays.items()}
        data0 = {**obs0, **dict(self.args)}
        state, fe0, _, cross = cold(data0)
        post0 = _extract_posteriors(compiled, state)
        args1 = au(post0, _MessageFetch(compiled, state, data0))

        def step(carry, obs_t):
            args, st, cr = carry
            data_t = {**obs_t, **args}
            st, fe, _, cr = warm(data_t, st, cr)
            post = _extract_posteriors(compiled, st)
            nxt = au(post, _MessageFetch(compiled, st, data_t))
            return (nxt, st, cr), (post, fe)

        t_total = next(iter(obs_arrays.values())).shape[0]
        if t_total > 1:
            rest = {k: v[1:] for k, v in obs_arrays.items()}
            (final_args, _, _), (posts, fes) = jax.lax.scan(
                step, (args1, state, cross), rest
            )
            posts = jax.tree_util.tree_map(
                lambda h, r: jnp.concatenate([h[None], r]), post0, posts
            )
            fes = jnp.concatenate([fe0[None], fes])
        else:
            final_args = args1
            posts = jax.tree_util.tree_map(lambda h: h[None], post0)
            fes = fe0[None]
        self.args = {k: v for k, v in final_args.items()}
        return posts, fes

    def _ensure_stream_plan(self, obs_arrays: dict):
        """Probe-once fused-stream eligibility (engine/stream_plan.py)."""
        if (self.free_energy or self._need_keep_each or self.iterations != 1
                or self.annotations is not None
                or self.postprocess is not None
                or self.returnvars is not None):
            return None
        if self._stream_plan is None:
            from .engine.stream_plan import plan_fused_stream

            example = {k: np.asarray(v[0][0])
                       for k, v in obs_arrays.items()}
            self._stream_plan = plan_fused_stream(
                self._compiled, self.autoupdates, example) or False
        return self._stream_plan or None

    def _run_offline_batched(self, observations: dict):
        """Batched offline fast path: the whole (T, B, ...) stream runs in
        ONE jitted program — per-tick programs vmapped over the B independent
        streams, ``lax.scan`` over time, and (with ``mesh=``) the batch axis
        shard_mapped along ``mesh_axis`` (pure DP: autoupdates feedback is
        per-stream, so steady state needs zero collectives)."""
        from .inference import _extract_posteriors

        obs_arrays = {k: as_f32_device(v)
                      for k, v in observations.items()}
        args_in = dict(self.args)
        if self.mesh is not None:
            # pin input shardings BEFORE the call: the first tick passes
            # unsharded initial args while later calls pass the shard_map
            # outputs — without this the differing input shardings force a
            # silent full recompile on the second call (round-5, observed as
            # a phantom 15x "mesh overhead")
            from jax.sharding import NamedSharding, PartitionSpec as P

            ax = self.mesh_axis
            obs_arrays = {
                k: jax.device_put(v, NamedSharding(self.mesh, P(None, ax)))
                for k, v in obs_arrays.items()}
            args_in = {
                k: jax.device_put(v, NamedSharding(self.mesh, P(ax)))
                for k, v in args_in.items()}
        first = {k: v[0] for k, v in obs_arrays.items()}       # (B, ...)
        self._ensure_compiled(first)
        self._check_batch(first)
        compiled = self._compiled
        # FUSED STREAM PLAN (round-5): probe the tick + autoupdates for the
        # linear-Gaussian filtering pattern and run the whole stream through
        # the entrywise filter machine (engine/stream_plan.py) — the generic
        # vmapped tick's many small kernels cost ~15x more per tick
        plan = self._ensure_stream_plan(obs_arrays)
        if plan is not None:
            from .dists import MvNormalMeanCovariance
            from .engine.stream_plan import make_fused_stream_fn

            key_f = ("fstream",)
            if key_f not in self._jitted:
                self._jitted[key_f] = make_fused_stream_fn(
                    plan, self.mesh, self.mesh_axis)
            means, covs, fpm, fpc = self._jitted[key_f](
                obs_arrays[plan.obs], args_in[plan.pm_arg],
                args_in[plan.pc_arg])
            self.args = {plan.pm_arg: fpm, plan.pc_arg: fpc}
            posts = {plan.var: MvNormalMeanCovariance(means, covs)}
            t_total = means.shape[0]
            batch = means.shape[1]
            return posts, jnp.zeros((t_total, batch, 0))
        cache_key = ("boffline", self.iterations, self.free_energy,
                     self.mesh is not None)
        if cache_key in self._jitted:
            with compiled._prec_ctx():
                final_args, posts, fes = self._jitted[cache_key](
                    obs_arrays, args_in)
            self.args = {k: v for k, v in final_args.items()}
            return posts, fes
        cold = jax.vmap(compiled.make_tick_program(
            self.iterations, self.free_energy, False, cold=True))
        warm = jax.vmap(compiled.make_tick_program(
            self.iterations, self.free_energy, False, cold=False))
        au = self.autoupdates

        def offline(obs, args0):
            obs0 = {k: v[0] for k, v in obs.items()}
            data0 = {**obs0, **args0}
            state, fe0, _, cross = cold(data0)
            post0 = _extract_posteriors(compiled, state)
            args1 = au(post0,
                       _MessageFetch(compiled, state, data0, batched=True))

            def step(carry, obs_t):
                args, st, cr = carry
                data_t = {**obs_t, **args}
                st, fe, _, cr = warm(data_t, st, cr)
                post = _extract_posteriors(compiled, st)
                nxt = au(post,
                         _MessageFetch(compiled, st, data_t, batched=True))
                return (nxt, st, cr), (post, fe)

            t_total = next(iter(obs.values())).shape[0]
            if t_total > 1:
                rest = {k: v[1:] for k, v in obs.items()}
                (final_args, _, _), (posts, fes) = jax.lax.scan(
                    step, (args1, state, cross), rest
                )
                posts = jax.tree_util.tree_map(
                    lambda h, r: jnp.concatenate([h[None], r]), post0, posts
                )
                fes = jnp.concatenate([fe0[None], fes])
            else:
                final_args = args1
                posts = jax.tree_util.tree_map(lambda h: h[None], post0)
                fes = fe0[None]
            return final_args, posts, fes

        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P

            ax = self.mesh_axis
            offline_fn = _shard_map_fn(
                offline, self.mesh, ax,
                in_specs=(P(None, ax), P(ax)),
                out_specs=(P(ax), P(None, ax), P(None, ax)),
            )
        else:
            offline_fn = offline
        self._jitted[cache_key] = jax.jit(offline_fn)
        with compiled._prec_ctx():
            final_args, posts, fes = self._jitted[cache_key](
                obs_arrays, args_in)
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
                    iterations=1, free_energy=False,
                    free_energy_diagnostics="default", keephistory=0,
                    options=None, uselock=False, constraints=None, meta=None,
                    callbacks=None, returnvars=None, historyvars=None,
                    annotations=None, postprocess=None, benchmark=False,
                    trace=False, catch_exception=False, session="default",
                    allow_node_contraction=False, batched=False, mesh=None,
                    mesh_axis="dp"):
    """Streaming dispatch target of `infer` (reference
    src/inference/inference.jl:700-731) — forwards the full kwarg surface."""
    if autoupdates is None:
        raise ValueError("streaming inference requires autoupdates=")
    if catch_exception:
        raise ValueError(
            "catch_exception= is batch-only; streaming errors flip "
            "engine.is_errored and fire the 'on_error' event (reference: "
            "src/inference/streaming.jl:438-452)."
        )
    warn = True if options is None else options.get("warn", True)
    engine = RxInferenceEngine(
        model, autoupdates, iterations=iterations,
        free_energy=free_energy,
        free_energy_diagnostics=free_energy_diagnostics,
        keephistory=keephistory, options=options,
        initialization=initialization, uselock=uselock,
        constraints=constraints, meta=meta, event_callbacks=callbacks,
        returnvars=returnvars, historyvars=historyvars,
        annotations=annotations, postprocess=postprocess, warn=warn,
        allow_node_contraction=allow_node_contraction,
        batched=batched, mesh=mesh, mesh_axis=mesh_axis,
    )
    if benchmark:
        from .utils.callbacks import BenchmarkCallbacks

        bench = BenchmarkCallbacks()
        engine._recorders.append(
            lambda ev: bench.timestamps[ev.name].append(ev.timestamp_ns))
        engine.benchmark = bench
    if trace:
        from .utils.callbacks import TraceCallbacks

        tr = TraceCallbacks()
        engine._recorders.append(tr.events.append)
        engine.trace = tr
    from .utils.session import get_default_session

    sess = get_default_session() if session == "default" else session
    if sess is not None:
        sess.log_invoke(
            label="streaming_inference",
            model=getattr(model, "name", str(model)),
            data_keys=sorted(autoupdates.initial),
            iterations=iterations,
            status="created",
            duration_s=0.0,
        )
    if datastream is not None:
        engine.start(datastream)
    return engine
