"""Constraints specification (reference: GraphPPL @constraints DSL +
src/constraints/form/*.jl form constraints).

Factorization: the engine's default factorization is the reference's common
operating point — structured pairwise clusters on each node's BP cluster
(chains exactly via scans; single-step Gaussian/GCV pairs via cavity
messages, e.g. the HGF's joint q(xt, xt_min)), mean-field across parameter
links.  ``factorize()`` pairs that cut INSIDE a node's structured cluster
degrade that factor to mean-field (rule variants + FE accounting); pairs
across the default mean-field boundary — e.g. the reference HGF constraint
``q(xt, zt, xt_min) = q(xt, xt_min)q(zt)``, which only splits zt off the GCV
cluster — validate as no-ops, KEEPING the joint pair.  ``MeanField()``
splits everything.

Functional-form constraints (reference src/constraints/form/):
  PointMassFormConstraint  — collapse a marginal to its MAP point
  SampleListFormConstraint — sample-list approximation of the marginal
  FixedMarginalFormConstraint — pin a marginal to a fixed distribution
Applied to a group's marginal after each product update (reference:
constrain_form in the message-product context).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp


class MeanField:
    """Fully factorized variational family (reference MeanField()): every
    factor's neighborhood is split into independent marginals — messages use
    the nodes' mean-field (``q_*``) rule variants and the Bethe FE uses
    mean-field factor entropies.  Exact chain blocks (Kalman / forward-
    backward) are kept structured: they are exact and strictly dominate the
    mean-field approximation on chains."""


class FullFactorization:
    """Alias of the engine default (structured pairwise clusters on Gaussian
    mean/out and deterministic nodes; mean-field across parameter links)."""


def factorize(*pairs: tuple) -> list:
    """q(x, y) = q(x) q(y) splits (reference ``@constraints q(x, y) = q(x)q(y)``).

    Each pair names two variables whose joint is forced to factorize: every
    factor connecting them switches to mean-field (VMP) message semantics and
    mean-field free-energy accounting."""
    out = []
    for p in pairs:
        if len(p) < 2:
            raise ValueError(f"factorize() pairs need >= 2 names, got {p!r}")
        out.append(tuple(p))
    return out


def factorize_slots(*names: str) -> list:
    """``q(x) = q(x[begin]) .. q(x[end])`` — mean-field across the slots of an
    array variable (reference index-ranged constraints,
    docs/src/manuals/variational/constraints-specification.md:107-292; used by
    the GMM suites to factorize component means/precisions).

    Non-chain array groups are already slot-factored in this engine (per-slot
    natural-parameter products), so the spec validates and records intent;
    requesting it on an exactly-solved chain raises (the chain blocks are
    strictly tighter than a slot-factored approximation)."""
    return list(names)


@dataclasses.dataclass
class Constraints:
    """Container passed to infer(constraints=...)."""

    factorization: Any = None  # MeanField() | list of name-tuples | None
    forms: Optional[dict] = None  # var name -> form constraint (q(x)::C)
    slot_factorized: Optional[list] = None  # array vars mean-field over slots
    # scope name -> Constraints applying inside that submodel scope (reference:
    # @constraints ``for q in submodel ... end`` blocks; instance-specific via
    # 'name:2' keys — the ``(submodel, i)`` syntax).
    submodel: Optional[dict] = None
    # var name -> form constraint applied to each inbound MESSAGE before the
    # marginal product (reference μ(x)::C message-form constraints,
    # docs/src/manuals/variational/constraints-specification.md).
    message_forms: Optional[dict] = None
    # filled by expansion: scope prefixes whose factors go mean-field
    mf_scopes: Optional[list] = None


def constraints(factorization: Any = None, forms: Optional[dict] = None,
                slot_factorized: Optional[list] = None,
                submodel: Optional[dict] = None,
                message_forms: Optional[dict] = None) -> Constraints:
    return Constraints(factorization, forms or {}, slot_factorized or [],
                       submodel or {}, message_forms or {})


def _scope_base(segment: str) -> str:
    return segment.split(":")[0]


def expand_submodel_constraints(graph, cons: Constraints,
                                defaults: Optional[dict] = None) -> Constraints:
    """Flatten submodel-scoped constraint blocks against the traced graph:
    translate each block's local variable names to full scoped names
    ('walk:2/x') for every matching scope instance.  A key 'walk' matches all
    instances of the scope, 'walk:2' exactly one (reference: ``for q in
    submodel`` vs specific-instance ``(submodel, i)`` blocks).

    ``defaults`` maps submodel base names to the Constraints declared with
    ``@rx.submodel(default_constraints=...)`` — applied to every instance the
    user's blocks did NOT target (reference:
    ``GraphPPL.default_constraints(::typeof(inner))``,
    docs/src/manuals/variational/constraints-specification.md:240-256)."""
    if not cons.submodel and not defaults:
        return cons
    # collect scope-instance prefixes present in the graph
    prefixes: set[tuple] = set()
    for v in list(graph.variables) + list(graph.factors):
        path = v.scope
        for i in range(len(path)):
            prefixes.add(path[: i + 1])

    flat = Constraints(
        factorization=(
            cons.factorization
            if isinstance(cons.factorization, MeanField) or cons.factorization is None
            else list(cons.factorization)
        ),
        forms=dict(cons.forms or {}),
        slot_factorized=list(cons.slot_factorized or []),
        message_forms=dict(cons.message_forms or {}),
        mf_scopes=[],
    )
    known = {v.name for v in graph.variables if v.kind == "random"}

    def _apply_block(key, sub, p):
        prefix = "/".join(p)
        if isinstance(sub.factorization, MeanField):
            flat.mf_scopes.append(prefix)
        elif sub.factorization:
            if flat.factorization is None:
                flat.factorization = []
            if isinstance(flat.factorization, MeanField):
                pass  # global MeanField already dominates
            else:
                for tup in sub.factorization:
                    flat.factorization.append(
                        tuple(f"{prefix}/{n}" for n in tup)
                    )
        for local, form in (sub.forms or {}).items():
            full = f"{prefix}/{local}"
            if full not in known:
                raise ValueError(
                    f"submodel constraint block {key!r}: no variable "
                    f"{local!r} in scope {prefix!r}."
                )
            flat.forms[full] = form
        for local in (sub.slot_factorized or []):
            flat.slot_factorized.append(f"{prefix}/{local}")
        for local, form in (getattr(sub, "message_forms", None) or {}).items():
            flat.message_forms[f"{prefix}/{local}"] = form

    user_matched: set[tuple] = set()
    for key, sub in (cons.submodel or {}).items():
        if getattr(sub, "submodel", None):
            raise NotImplementedError(
                "nested submodel constraint blocks: scope the inner block "
                "directly by its path key instead."
            )
        matched = [
            p for p in prefixes
            if (p[-1] == key if ":" in key else _scope_base(p[-1]) == key)
        ]
        if not matched:
            raise ValueError(
                f"constraints submodel block {key!r} matches no scope in the "
                f"model (scopes present: "
                f"{sorted('/'.join(p) for p in prefixes) or 'none'})."
            )
        user_matched.update(matched)
        for p in sorted(matched):
            _apply_block(key, sub, p)
    for base, sub in (defaults or {}).items():
        for p in sorted(prefixes):
            if _scope_base(p[-1]) == base and p not in user_matched:
                _apply_block(base, sub, p)
    return flat


# ---------------------------------------------------------------------------------
# Functional form constraints
# ---------------------------------------------------------------------------------

class AbstractFormConstraint:
    def constrain(self, dist):
        raise NotImplementedError


class UnspecifiedFormConstraint(AbstractFormConstraint):
    """No-op form constraint (reference UnspecifiedFormConstraint,
    docs/src/manuals/variational/functional-forms.md) — same as leaving the
    variable unconstrained; exists for name parity."""

    def constrain(self, dist):
        return dist


class ComposedFormConstraint(AbstractFormConstraint):
    """Stacked form constraints applied left to right (reference: composed
    ``q(x) :: C1 :: C2`` stacking,
    docs/src/manuals/variational/constraints-specification.md)."""

    def __init__(self, parts):
        self.parts = list(parts)

    def constrain(self, dist):
        for p in self.parts:
            dist = p.constrain(dist)
        return dist


def as_form_constraint(spec):
    """Normalize a form-constraint spec: tuple/list -> ComposedFormConstraint."""
    if spec is None:
        return None
    if isinstance(spec, (tuple, list)):
        return ComposedFormConstraint(spec) if len(spec) > 1 else spec[0]
    return spec


class PointMassFormConstraint(AbstractFormConstraint):
    """MAP collapse (reference PointMassFormConstraint,
    src/constraints/form/form_point_mass.jl:53-205).

    For conjugate carrier families the mode is closed-form (this covers the
    reference's discrete argmax path too — Categorical.mode()).  For custom
    densities, non-analytic modes, or when ``optimizer=`` / ``boundaries=`` /
    ``starting_point=`` are given, the MAP point is found by LBFGS on
    −log q(x) inside the compiled program (the reference runs Optim
    LBFGS/Fminbox with the same three hooks):

    - ``optimizer``: None (optax.lbfgs), an optax GradientTransformation, or
      a callable ``(neg_logpdf, x0) -> x_opt`` for full custom control.
    - ``starting_point``: array or callable ``() -> array``; defaults to the
      previous marginal's mean (warm start), else the first proper message's
      mean.
    - ``boundaries``: (lo, hi) box — iterates are projected into the box
      (the Fminbox equivalent)."""

    def __init__(self, optimizer=None, starting_point=None, boundaries=None,
                 n_iters: int = 60):
        self.optimizer = optimizer
        self.starting_point = starting_point
        self.boundaries = boundaries
        self.n_iters = n_iters

    @property
    def _wants_optimizer(self) -> bool:
        return (self.optimizer is not None or self.boundaries is not None
                or self.starting_point is not None)

    def _x0(self, msgs, prev):
        if self.starting_point is not None:
            x0 = (self.starting_point() if callable(self.starting_point)
                  else self.starting_point)
            return jnp.asarray(x0, jnp.float32)
        for cand in ([prev] if prev is not None else []) + list(msgs):
            try:
                return jnp.asarray(cand.mean(), jnp.float32)
            except Exception:  # noqa: BLE001
                continue
        raise ValueError(
            "PointMassFormConstraint: no starting point derivable from the "
            "messages; pass starting_point=."
        )

    def _clip(self, x):
        if self.boundaries is None:
            return x
        lo, hi = self.boundaries
        return jnp.clip(x, lo, hi)

    def _optimize(self, msgs, prev=None):
        import optax

        from ..dists import PointMass

        def neg_logpdf(x):
            return -sum(m.logpdf(x) for m in msgs)

        x0 = self._clip(self._x0(msgs, prev))
        if callable(self.optimizer) and not isinstance(
                self.optimizer, optax.GradientTransformation):
            return PointMass(jnp.asarray(self.optimizer(neg_logpdf, x0)))
        opt = (self.optimizer if self.optimizer is not None
               else optax.lbfgs())
        value_and_grad = optax.value_and_grad_from_state(neg_logpdf)
        state0 = opt.init(x0)

        def step(carry, _):
            params, state = carry
            value, grad = value_and_grad(params, state=state)
            updates, state = opt.update(
                grad, state, params, value=value, grad=grad,
                value_fn=neg_logpdf,
            )
            params = self._clip(optax.apply_updates(params, updates))
            return (params, state), None

        (x_opt, _), _ = jax.lax.scan(step, (x0, state0), None,
                                     length=self.n_iters)
        return PointMass(x_opt)

    def constrain(self, dist):
        from ..dists import PointMass

        if not self._wants_optimizer:
            try:
                return PointMass(jnp.asarray(dist.mode()))
            except Exception:  # noqa: BLE001 — no analytic mode: optimize
                pass
        return self._optimize([dist])

    # engine hook: called with the raw message list when the product has no
    # closed form (NodeFunctionRuleFallback carriers) — non-conjugate MAP
    def project_product(self, msgs, prev=None):
        from ..dists import PointMass
        from ..dists.natural import prod_all

        if not self._wants_optimizer:
            try:
                return PointMass(jnp.asarray(prod_all(msgs).mode()))
            except Exception:  # noqa: BLE001
                pass
        return self._optimize(msgs, prev=prev)


class FixedMarginalFormConstraint(AbstractFormConstraint):
    """Pin the marginal (reference FixedMarginalFormConstraint)."""

    def __init__(self, dist):
        self.dist = dist

    def constrain(self, dist):
        del dist
        return self.dist


class LeftProposal:
    """Use the FIRST message as the SampleList proposal (reference
    LeftProposal)."""


class RightProposal:
    """Use the LAST message as the SampleList proposal (reference
    RightProposal)."""


class AutoProposal:
    """Pick the first proper (sampleable, non-logpdf-carrier) message as the
    proposal (reference AutoProposal: proper distributions take priority over
    GenericLogPdf/LinearizedProductOf candidates)."""


class SampleListFormConstraint(AbstractFormConstraint):
    """Importance-sampled approximation of the MESSAGE PRODUCT (reference
    SampleListFormConstraint, src/constraints/form/form_sample_list.jl:29-104):
    samples are drawn from a proposal chosen among the product's factors
    (Left/Right/Auto strategies) and weighted by the remaining factors —
    bootstrap importance sampling of Π_i m_i(x).

    Closed-form marginals pass through UNCHANGED (the reference's
    ``constrain_form(::SampleListFormConstraint, something) = something``) —
    the approximation only engages on products without a closed form."""

    def __init__(self, n_samples: int = 256, seed: int = 0, strategy=None):
        self.n_samples = n_samples
        self.seed = seed
        self.strategy = strategy if strategy is not None else AutoProposal()

    def _pick_proposal(self, msgs):
        if isinstance(self.strategy, LeftProposal):
            return 0
        if isinstance(self.strategy, RightProposal):
            return len(msgs) - 1
        for i, m in enumerate(msgs):
            if hasattr(m, "sample") and not hasattr(m, "log_fn"):
                return i
        raise ValueError(
            "Cannot approximate the product as a sample list: the "
            "AutoProposal strategy cannot choose a proposal distribution "
            "(no factor is a proper distribution). Use LeftProposal or "
            "RightProposal (reference: form_sample_list.jl:88-96)."
        )

    def project_product(self, msgs, prev=None):
        from ..dists import SampleList
        from ..dists.natural import prod_all

        try:
            # closed-form product exists: pass through unchanged
            return prod_all(msgs)
        except Exception:  # noqa: BLE001 — genuine non-conjugate product
            pass
        idx = self._pick_proposal(msgs)
        proposal = msgs[idx]
        key = jax.random.PRNGKey(self.seed)
        z = proposal.sample(key, (self.n_samples,))
        logw = sum(
            (m.logpdf(z) for i, m in enumerate(msgs) if i != idx),
            start=jnp.zeros((self.n_samples,)),
        )
        return SampleList(z, logw)

    def constrain(self, dist):
        # proper distribution: pass through (reference form_sample_list.jl:98)
        return dist


class InitMessage:
    """``μ(x) = dist`` initialization (reference @initialization message form,
    src/model/plugins/initialization_plugin.jl:146-199).

    Under the compiled static schedule an initial edge message and an initial
    marginal play the same bootstrap role: the wrapped distribution stands in
    for the variable's belief until its first update.  The wrapper exists for
    API parity; ``initialization={"x": InitMessage(d)}`` == ``{"x": d}``."""

    def __init__(self, dist):
        self.dist = dist
