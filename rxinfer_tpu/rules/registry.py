"""Rule registry — the ReactiveMP @node/@rule/@average_energy equivalent.

The reference dispatches rules dynamically per message via Julia multiple dispatch
(docs/src/manuals/rules_and_nodes.md:31-66).  Here every lookup happens at
*schedule-compile time* (SURVEY.md §3.5: "This dispatch table … is exactly what the
TPU compiler resolves statically at lowering time"); the looked-up rule functions
are pure JAX functions traced into one XLA program.

A node definition provides:
  * ``interfaces``: ordered interface names, 'out' first.
  * ``message_to_<iface>(q: dict) -> Distribution``: VMP message to that interface
    given marginals of the *other* interfaces (mean-field variant; the reference
    ``q_*`` rules).  For observed/constant interfaces q[iface] is a PointMass.
  * ``average_energy(q: dict) -> array``: E_q[-log f] (reference @average_energy),
    used by the Bethe free-energy assembly.  Accepts an optional 'joint' entry for
    structured (non-mean-field) pairs.
  * ``logpdf(values: dict) -> array``: node density at point values (rule fallback,
    reference NodeFunctionRuleFallback).

Custom nodes register with ``@node``; missing rules produce a compile-time
"rule not found" error naming the node and interface (reference:
docs/src/manuals/sharpbits/rule-not-found.md).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

_NODES: dict[str, type] = {}


class trace_messages:
    """Record every message-rule invocation while a program is built/traced
    (reference: "Tracing individual message computations",
    docs/src/manuals/debugging.md:136-143 — per-rule-call events).

    In this engine rules fire at COMPILE/trace time (the schedule is static),
    so the recording is the message schedule itself: one entry per
    (node, interface, variant) rule dispatch, in execution order::

        with rx.trace_messages() as mt:
            rx.infer(model=m, data=...)
        mt.records   # [{'node': 'NormalMeanPrecision', 'interface': 'mean',
                     #   'mean_field': False}, ...]
    """

    # contextvars: concurrent inferences (uselock producers) and nested
    # trace_messages contexts each see their own recorder; __exit__ restores
    # the enclosing one instead of clobbering it.
    import contextvars as _contextvars

    _active = _contextvars.ContextVar("trace_messages_active", default=None)

    def __init__(self):
        self.records: list[dict] = []
        self._token = None

    def __enter__(self):
        self._token = trace_messages._active.set(self)
        return self

    def __exit__(self, *exc):
        trace_messages._active.reset(self._token)
        self._token = None
        return False

    @staticmethod
    def record(**entry):
        rec = trace_messages._active.get()
        if rec is not None:
            rec.records.append(entry)


class RuleNotFoundError(KeyError):
    pass


def node(fform: str):
    """Register a node-rule namespace class under a canonical fform name."""

    def deco(cls):
        cls.fform = fform
        _NODES[fform] = cls
        return cls

    return deco


def get_node(fform: str):
    try:
        return _NODES[fform]
    except KeyError:
        raise RuleNotFoundError(
            f"No node definition registered for '{fform}'. Registered: "
            f"{sorted(_NODES)}. Define one with @node('{fform}') providing "
            "message_to_* and average_energy (see rules/registry.py)."
        ) from None


def get_message_rule(fform: str, iface: str, vmp: bool = False) -> Callable:
    """Resolve the message rule for (node, interface).

    ``vmp=True`` selects the node's mean-field variant (``vmp_message_to_*``,
    the reference's ``q_*`` rule signatures) when one exists — used for
    factors split by an explicit factorization constraint; otherwise the
    default (structured/BP ``m_*``-style) rule is returned."""
    cls = get_node(fform)
    if vmp:
        fn = getattr(cls, f"vmp_message_to_{iface}", None)
        if fn is not None:
            return fn
    fn = getattr(cls, f"message_to_{iface}", None)
    if fn is None:
        raise RuleNotFoundError(
            f"Rule not found: node '{fform}' has no message rule towards interface "
            f"'{iface}'. Available: "
            f"{[m[len('message_to_'):] for m in dir(cls) if m.startswith('message_to_')]}. "
            "This mirrors the reference's rule-not-found diagnostic "
            "(docs/src/manuals/sharpbits/rule-not-found.md)."
        )
    return fn


def get_average_energy(fform: str) -> Callable:
    cls = get_node(fform)
    fn = getattr(cls, "average_energy", None)
    if fn is None:
        raise RuleNotFoundError(
            f"Node '{fform}' defines no average_energy — free_energy=True is not "
            "supported for models containing it."
        )
    return fn


def has_node(fform: str) -> bool:
    return fform in _NODES


def call_rule(fform: str, iface: str, vmp: bool = False, meta: dict = None,
              **marginals):
    """Directly invoke a node's message rule outside of inference (reference
    ``@call_rule NodeType(:iface, Marginalisation)(q_... = ...)``,
    docs/src/manuals/inference/create-node.md:197-228).

    Keyword arguments name the node's OTHER interfaces and map to marginal /
    message distributions (the reference's ``q_*``/``m_*`` arguments — under
    the compiled engine both are distributions).  ``iface="average_energy"``
    evaluates the node's average energy instead (the reference's
    ``@call_rule``-adjacent ``@average_energy`` testing workflow)."""
    q = dict(marginals)
    if meta is not None:
        q["_meta"] = meta
    if iface == "average_energy":
        return get_average_energy(fform)(q)
    return get_message_rule(fform, iface, vmp=vmp)(q)


class NodeFunctionRuleFallback:
    """Approximate missing message rules from the node's ``logpdf`` (reference:
    ReactiveMP NodeFunctionRuleFallback, docs/src/manuals/inference/
    undefinedrules.md:82-113).

    The outbound message towards an interface is the node function with every
    other interface fixed at its current marginal mean — a function-form
    ``LogPdfMessage`` that must be projected by a functional-form constraint
    (``ProjectedTo`` / ``SampleList`` / ``PointMass``) on the receiving
    variable, exactly as the reference requires.

    Enable via ``infer(options={"rulefallback": NodeFunctionRuleFallback()})``.
    """

    def make_rule(self, fform: str, iface: str) -> Callable:
        import jax.numpy as jnp

        from ..dists import LogPdfMessage
        from .expectations import e_mean

        cls = get_node(fform)
        logpdf = getattr(cls, "logpdf", None)
        if logpdf is None:
            raise RuleNotFoundError(
                f"Rule not found for '{fform}' -> '{iface}', and the node "
                "defines no logpdf for NodeFunctionRuleFallback to use."
            )

        def rule(q):
            others = {
                name: jnp.asarray(e_mean(d))
                for name, d in q.items()
                if name != "_meta"
            }
            plated = any(jnp.ndim(v) >= 1 for v in others.values())

            def log_fn(x):
                vals = dict(others)
                vals[iface] = x[..., None] if plated else x
                return logpdf(vals)

            return LogPdfMessage(log_fn, plate_axes=1 if plated else 0)

        return rule
