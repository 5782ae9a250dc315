"""Graph → static schedule compiler (the replacement for the reference's entire
reactive runtime: Rocket streams + ReactiveMP activation,
SURVEY.md §7 architecture stance).

Lowering pipeline:
  1. normalize chain transitions (fold plain Gaussians with lagged means into
     LinearGaussian fforms — node contraction),
  2. detect chain blocks (Gaussian → Kalman scans, discrete → forward-backward),
  3. group remaining variables into conjugate VMP PlainGroups,
  4. schedule the per-iteration sweep: greedy topological order where groups with
     explicit initialization count as available (the compile-time analogue of the
     reference's @initialization requirement for loopy models),
  5. emit a pure (data, n_iterations) → (posteriors, free_energy[]) function,
     jitted once; iterations are unrolled at trace time.

Compile-time completeness checks replace the reference's runtime update-flag
protocol (src/inference/inference.jl:46-86).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..dists import PointMass
from ..graph.ir import Const, Factor, ModelGraph, Ref, SymIndex
from ..rules.registry import RuleNotFoundError, get_message_rule
from .bethe import FactorFE, slot_degrees, variable_entropy_term
from .blocks import (
    ARChainBlock,
    DiscreteChainBlock,
    GCVChainBlock,
    GaussianChainBlock,
    PlainGroup,
    _coverage,
    build_q,
)
from .shapes import resolve_groups

def as_f32_device(v):
    """float32 device array WITHOUT a host round-trip for values already on
    device — ``jnp.asarray(np.asarray(v), ...)`` silently copies device
    arrays through host memory (round-5: 160 MB per run_offline call made
    the streaming wrapper 4x slower than its own compiled program)."""
    if isinstance(v, jax.Array):
        return v if v.dtype == jnp.float32 else v.astype(jnp.float32)
    return jnp.asarray(np.asarray(v), jnp.float32)


_GAUSSIAN_TRANS = {
    "LinearGaussianCovariance",
    "LinearGaussianPrecision",
    "MvLinearGaussianCovariance",
    "MvLinearGaussianPrecision",
}

_PLAIN_GAUSS = {
    "NormalMeanVariance": ("LinearGaussianCovariance", "var"),
    "NormalMeanPrecision": ("LinearGaussianPrecision", "prec"),
    "MvNormalMeanCovariance": ("MvLinearGaussianCovariance", "cov"),
    "MvNormalMeanPrecision": ("MvLinearGaussianPrecision", "prec"),
}


def _lag_ref(f: Factor):
    """Return (iface, Ref) of a lag-1 self-reference, if f is a transition."""
    if not isinstance(f.out.idx, SymIndex):
        return None
    for name, v in f.interfaces.items():
        if (
            isinstance(v, Ref)
            and v.var is f.out.var
            and isinstance(v.idx, SymIndex)
            and v.idx.offset == f.out.idx.offset - 1
        ):
            return name, v
    return None


_GAUSS_MEAN_CONTRACT = {
    "NormalMeanVariance": "NonlinearGaussianCovariance",
    "NormalMeanPrecision": "NonlinearGaussianPrecision",
    "MvNormalMeanCovariance": "NonlinearGaussianCovariance",
    "MvNormalMeanPrecision": "NonlinearGaussianPrecision",
}


def contract_deltas(graph: ModelGraph) -> None:
    """Fold ``Normal(mean=Delta(fn, ...), noise)`` pairs into NonlinearGaussian
    factors (reference: anonymous-node contraction around delta nodes,
    docs/src/manuals/inference/delta-node.md).  Backward messages then become
    IEKF/UKF-style likelihood messages — exact for linear fn."""
    for delta_f in [f for f in graph.factors if f.fform == "Delta"]:
        w = delta_f.out.var
        if not w.name.startswith("_"):
            continue  # user kept a handle on the intermediate: leave explicit
        neighbors = []
        for f in graph.factors:
            if f is delta_f:
                continue
            for v in f.all_interfaces().values():
                if isinstance(v, Ref) and v.var is w:
                    neighbors.append(f)
                    break
        if len(neighbors) != 1:
            continue
        g = neighbors[0]
        mean_ref = g.interfaces.get("mean")
        if g.fform not in _GAUSS_MEAN_CONTRACT or not isinstance(mean_ref, Ref):
            continue
        if mean_ref.var is not w or g.plate is not delta_f.plate:
            continue
        noise_key = [k for k in g.interfaces if k != "mean"][0]
        new_interfaces = dict(delta_f.interfaces)
        new_interfaces[noise_key] = g.interfaces[noise_key]
        g.fform = _GAUSS_MEAN_CONTRACT[g.fform]
        g.interfaces = new_interfaces
        g.meta = delta_f.meta
        graph.factors.remove(delta_f)
        graph.variables.remove(w)


def normalize_transitions(graph: ModelGraph, infos) -> None:
    """Fold plain-Gaussian lag transitions into LinearGaussian fforms (A=I, b=0) —
    node contraction, reference docs/src/manuals/model-specification.md:332-447."""
    for f in graph.factors:
        lag = _lag_ref(f)
        if lag is None:
            continue
        if f.fform in _PLAIN_GAUSS and lag[0] == "mean":
            new_ff, noise_name = _PLAIN_GAUSS[f.fform]
            shape = infos[f.out.var.name].event_shape
            dim = shape[0] if shape else None
            noise_key = [k for k in f.interfaces if k != "mean"][0]
            noise = f.interfaces[noise_key]
            f.fform = new_ff
            f.interfaces = {
                "in": lag[1],
                "A": Const(np.eye(dim, dtype=np.float32) if dim else np.float32(1.0)),
                "b": Const(np.zeros(dim, dtype=np.float32) if dim else np.float32(0.0)),
                noise_name: noise,
            }


@dataclasses.dataclass
class ChainSpec:
    var: Any
    kind: str  # 'gaussian' | 'discrete'
    prior: Factor
    transition: Factor
    evidence: list


def detect_chains(graph: ModelGraph, infos) -> dict[str, ChainSpec]:
    chains: dict[str, ChainSpec] = {}
    for var in graph.random_variables():
        if not var.is_array:
            continue
        transitions = []
        for f in graph.factors:
            if f.out.var is var and _lag_ref(f) is not None:
                transitions.append(f)
        if not transitions:
            continue
        trans = transitions[0]
        if len(transitions) > 1:
            kind = None  # multiple lagged definitions: no closed-form block
        elif trans.fform in _GAUSSIAN_TRANS:
            kind = "gaussian"
        elif trans.fform == "AR":
            kind = "ar"
        elif trans.fform == "GCV":
            kind = "gcv"
        elif trans.fform == "DiscreteTransition":
            kind = "discrete"
        else:
            kind = None  # custom/unregistered transition node
        if kind is None:
            # Fall back to Jacobi message passing through the generic
            # PlainGroup machinery (the reference's behavior for arbitrary
            # nodes inside @model loops: iterative reactive message passing,
            # no special chain solver) — exactness per sweep is lost, the VMP
            # fixed point is the same; the variable needs initialization=
            # (the lag is a cycle for the static scheduler).
            import warnings

            warnings.warn(
                f"Chain over {var.name}: transition {trans.fform} has no "
                "associative-scan chain solver; falling back to iterative "
                "(Jacobi) message passing — expect slower convergence and "
                "provide initialization= for the chain variable.",
                stacklevel=2,
            )
            continue
        prior = None
        evidence = []
        for f in graph.factors:
            if f is trans:
                continue
            if f.out.var is var:
                if f.out.idx == 0 and f.plate is None and prior is None:
                    prior = f
                elif f.plate is None and isinstance(f.out.idx, int):
                    # extra unary factor pinning a non-initial slot (reference:
                    # `s[3] ~ Categorical(goal)` goal priors, inference_tests.jl
                    # :1663, collision_tests.jl goal pinning): enters the chain
                    # solve as out-message evidence at that slot.
                    evidence.append((f, "out"))
                else:
                    raise NotImplementedError(
                        f"Chain {var.name}: extra defining factor {f.fform} at "
                        f"{f.out.idx} (plated second definitions are not "
                        "supported)."
                    )
                continue
            for name, v in f.interfaces.items():
                if isinstance(v, Ref) and v.var is var:
                    if len(getattr(f, "plates", ())) >= 2:
                        raise NotImplementedError(
                            f"Chain {var.name}: nested-plate evidence factor "
                            f"{f.fform} is not supported (replicate the chain "
                            "per sequence instead)."
                        )
                    evidence.append((f, name))
                    break
        if prior is None:
            raise ValueError(f"Chain {var.name} has no prior factor at slot 0.")
        chains[var.name] = ChainSpec(var, kind, prior, trans, evidence)
    return chains


def _read_deps(var, graph: ModelGraph, chains) -> set[str]:
    """Random groups whose marginals this group's update reads."""
    deps: set[str] = set()
    if var.name in chains:
        spec = chains[var.name]
        factors = [spec.prior, spec.transition] + [f for f, _ in spec.evidence]
    else:
        factors = [
            f
            for f in graph.factors
            if any(
                isinstance(v, Ref) and v.var is var
                for v in f.all_interfaces().values()
            )
        ]
    for f in factors:
        for v in f.all_interfaces().values():
            if isinstance(v, Ref) and v.var.kind == "random" and v.var.name != var.name:
                deps.add(v.var.name)
    return deps


def _try_tree_schedule(remaining, graph: ModelGraph) -> Optional[list[str]]:
    """Order deadlocked variables as a tree sweep, or None if genuinely loopy.

    If the bipartite factor graph restricted to the blocked variables is
    acyclic (checked by union-find over each factor's blocked neighborhood),
    exact BP needs no initialization: a leaves→root pass followed by the
    reverse root→leaves pass computes every marginal exactly in one sweep
    (SURVEY.md §7: *compute* the schedule for tree graphs instead of
    discovering it reactively).  Blocked variables are vague-initialized so
    the not-yet-informed side of each update is a neutral message."""
    names = {v.name for v in remaining}
    fac_adj: dict[str, list] = {n: [] for n in names}
    fac_vars: list[tuple[int, list[str]]] = []
    for f in graph.factors:
        vs = sorted({
            v.var.name
            for v in f.all_interfaces().values()
            if isinstance(v, Ref) and v.var.kind == "random" and v.var.name in names
        })
        if len(vs) >= 2:
            fid = len(fac_vars)
            fac_vars.append((fid, vs))
            for n in vs:
                fac_adj[n].append(fid)

    parent = {n: n for n in names}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for _, vs in fac_vars:
        base = vs[0]
        for other in vs[1:]:
            rb, ro = find(base), find(other)
            if rb == ro:
                return None  # cycle in the factor graph: true loopy model
            parent[ro] = rb

    # DFS post-order over the (forest of) bipartite tree(s): leaves first.
    post: list[str] = []
    seen_v: set[str] = set()
    seen_f: set[int] = set()
    for root in sorted(names):
        if root in seen_v:
            continue
        stack = [(root, iter(fac_adj[root]))]
        seen_v.add(root)
        while stack:
            var, fac_iter = stack[-1]
            advanced = False
            for fid in fac_iter:
                if fid in seen_f:
                    continue
                seen_f.add(fid)
                for child in fac_vars[fid][1]:
                    if child not in seen_v:
                        seen_v.add(child)
                        stack.append((child, iter(fac_adj[child])))
                        advanced = True
                        break
                if advanced:
                    break
            if not advanced:
                post.append(var)
                stack.pop()
    # forward (leaves→root) + backward (root→leaves) pass
    return post + post[-2::-1]


def schedule_sweep(
    graph, chains, init_names: set[str]
) -> tuple[list[str], set[str]]:
    """Greedy topological sweep order; init-spec'd groups count as available.

    Returns (order, auto_init): variables in ``auto_init`` were deadlocked on
    each other but form a tree — they are scheduled as an exact fwd+bwd BP
    sweep and must be vague-initialized.  Raises with the reference's UX if
    the model is loopy and unschedulable without initialization
    (docs: initialization required for loopy/VMP models)."""
    remaining = [v for v in graph.random_variables()]
    available: set[str] = set(init_names)
    updated: set[str] = set()
    order: list[str] = []
    deps_map = {v.name: _read_deps(v, graph, chains) for v in remaining}
    # A non-chain group whose own factor touches it at TWO interfaces (a
    # lagged transition on the Jacobi fallback path: out = x[t], in = x[t-1])
    # reads its own marginal on the first sweep — vague-init it (the greedy
    # loop ignores self-deps, so it would otherwise schedule uninitialized).
    self_dep: set[str] = set()
    for v in remaining:
        if v.name in chains or v.name in init_names:
            continue
        for f in graph.factors:
            touches = sum(
                1 for iv in f.all_interfaces().values()
                if isinstance(iv, Ref) and iv.var is v
            )
            if touches >= 2:
                self_dep.add(v.name)
                break
    while remaining:
        progressed = False
        for v in list(remaining):
            deps = deps_map[v.name]
            if all(d in updated or d in available for d in deps):
                order.append(v.name)
                updated.add(v.name)
                remaining.remove(v)
                progressed = True
        if not progressed:
            tree_order = None
            if not any(v.name in chains for v in remaining):
                tree_order = _try_tree_schedule(remaining, graph)
            if tree_order is None:
                blocked = {v.name: sorted(deps_map[v.name] - updated - available)
                           for v in remaining}
                raise ValueError(
                    "Model contains initialization cycles; provide initialization "
                    f"for some of: {blocked}. (Reference equivalent: @initialization "
                    "is required for variational iterations.)"
                )
            return order + tree_order, {v.name for v in remaining} | self_dep
    return order, self_dep


def _prior_init(graph: ModelGraph, name: str, _memo=None, _stack=None):
    """Seed an auto-initialized variable by the ANCESTRAL forward pass: its
    whole-variable defining factor's ``message_to_out`` evaluated with Const
    interfaces as PointMass and random inputs recursively prior-seeded (the
    message the reference's reactive schedule would deliver first).  A vague
    marginal puts e.g. Unscented sigma points at ±1e6, which NaNs
    domain-restricted deltas (sqrt, log) and makes known-inverse pushes
    degenerate; the prior cascade is the faithful BP seed.  Returns None
    when the variable has no non-plated whole-variable defining factor or
    the cascade fails (fallback: vague)."""
    from ..rules.registry import get_message_rule

    _memo = {} if _memo is None else _memo
    _stack = set() if _stack is None else _stack
    if name in _memo:
        return _memo[name]
    if name in _stack:  # cycle: let the vague fallback break it
        return None
    _stack = _stack | {name}
    for f in graph.factors:
        if not (
            f.out.var.kind == "random"
            and f.out.var.name == name
            and f.out.idx is None
            and f.plate is None
        ):
            continue
        try:
            q = {}
            ok = True
            for k, v in f.interfaces.items():
                if isinstance(v, Const):
                    q[k] = PointMass(jnp.asarray(v.value, jnp.float32))
                elif (isinstance(v, Ref) and v.var.kind == "random"
                      and v.idx is None):
                    seed = _prior_init(graph, v.var.name, _memo, _stack)
                    if seed is None:
                        ok = False
                        break
                    q[k] = seed
                else:
                    ok = False
                    break
            if not ok:
                continue
            if f.meta is not None:
                q["_meta"] = {**f.meta, "_plated": False}
            with jax.ensure_compile_time_eval():
                out = get_message_rule(f.fform, "out")(q)
            _memo[name] = out
            return out
        except Exception:  # noqa: BLE001 — any failure: vague fallback
            continue
    _memo[name] = None
    return None


def _vague_for(family: str, event_shape: tuple):
    """Non-informative marginal for auto-initialized tree-schedule variables
    (reference: ``vague(T)``, BayesBase)."""
    from ..dists import (
        Bernoulli,
        Beta,
        Categorical,
        Dirichlet,
        GammaShapeRate,
        InverseGamma,
        InverseWishart,
        MvNormalMeanCovariance,
        NormalMeanVariance,
        Wishart,
    )

    # Gaussian vague scale: 1e6, not the reference's huge=1e12.  Tree-schedule
    # cavities are computed by natural-parameter subtraction in float32; a
    # 1e-12 vague precision is below f32 epsilon relative to informative
    # precisions, so it would cancel to an exactly-flat cavity (singular
    # convolutions).  1e-6 stays representable while biasing posteriors by
    # O(1e-5) relative — below every conformance tolerance.
    if family == "gaussian":
        return NormalMeanVariance(jnp.asarray(0.0), jnp.asarray(1.0e6))
    if family == "mv_gaussian":
        d = event_shape[0]
        return MvNormalMeanCovariance(jnp.zeros(d), 1.0e6 * jnp.eye(d))
    if family == "bernoulli":
        from ..dists import BernoulliLogits

        return BernoulliLogits.vague()  # exact-zero natural (flat)
    if family == "beta":
        return Beta.vague()
    if family in ("gamma", "gamma_shape_rate", "gamma_shape_scale"):
        return GammaShapeRate.vague()
    if family == "inverse_gamma":
        return InverseGamma.vague()
    if family == "categorical":
        return Categorical.vague(event_shape[0])
    if family == "dirichlet":
        return Dirichlet.vague(event_shape[0])
    if family == "wishart":
        return Wishart.vague(event_shape[0])
    if family == "inverse_wishart":
        return InverseWishart.vague(event_shape[0])
    raise ValueError(
        f"No vague initializer for family {family!r}; provide an explicit "
        "initialization for the tree-scheduled variables."
    )


def _mean_field_factor_ids(graph: ModelGraph, constraints) -> set[int]:
    """Factor ids whose neighborhood is split by a factorization constraint."""
    ids: set[int] = set()
    # submodel-scoped MeanField blocks: factors created under a matched scope
    for prefix in (getattr(constraints, "mf_scopes", None) or []):
        for f in graph.factors:
            fp = "/".join(f.scope)
            if fp == prefix or fp.startswith(prefix + "/"):
                ids.add(f.id)
    fac = getattr(constraints, "factorization", None) if constraints else None
    if fac is None:
        return ids
    from ..graph.constraints import MeanField

    if isinstance(fac, MeanField):
        return {f.id for f in graph.factors}
    known = {v.name for v in graph.random_variables()}
    groups = []
    for names in fac:
        unknown = set(names) - known
        if unknown:
            raise ValueError(
                f"factorization constraint names unknown variables {sorted(unknown)}"
            )
        groups.append(set(names))
    from ..rules.registry import get_node
    from .blocks import in_cavity_cluster

    for f in graph.factors:
        rvars = {
            v.var.name
            for v in f.all_interfaces().values()
            if isinstance(v, Ref) and v.var.kind == "random"
        }
        # Variables on the node's structured (cavity) cluster: a split that
        # cuts INSIDE the cluster forces the factor fully mean-field; a split
        # across the default mean-field boundary (e.g. the reference HGF's
        # q(xt, zt, xt_min) = q(xt, xt_min)q(zt) — zt is already across the
        # GCV cluster boundary) is the engine default and a no-op, KEEPING
        # the joint pair intact.
        try:
            node_cls = get_node(f.fform)
        except Exception:  # noqa: BLE001 — unregistered fform: conservative
            node_cls = None
        cluster = set()
        if node_cls is not None:
            cluster = {
                v.var.name
                for name, v in f.all_interfaces().items()
                if isinstance(v, Ref) and v.var.kind == "random"
                and in_cavity_cluster(node_cls, name)
            }
        relevant = cluster if cluster else rvars
        for g in groups:
            if len(relevant & g) >= 2:
                ids.add(f.id)
                break
    return ids


class CompiledModel:
    """AOT-compiled inference program for one model × data-shape signature."""

    def __init__(self, graph: ModelGraph, init: Optional[dict] = None,
                 options: Optional[dict] = None, constraints: Any = None,
                 meta: Optional[dict] = None, time_mesh: Any = None,
                 time_axis: str = "time"):
        options = options or {}
        self.graph = graph
        defaults = getattr(graph, "default_submodel_constraints", None)
        if defaults or (
            constraints is not None and getattr(constraints, "submodel", None)
        ):
            from ..graph.constraints import (
                Constraints,
                expand_submodel_constraints,
            )

            if constraints is None:
                constraints = Constraints(
                    factorization=None, forms={}, slot_factorized=[],
                    submodel={},
                )
            constraints = expand_submodel_constraints(
                graph, constraints, defaults
            )
        self.constraints = constraints
        # @meta equivalent: attach per-node-type metadata (reference MetaPlugin,
        # docs/src/manuals/inference/meta-specification.md) — e.g.
        # meta={"Delta": {"method": Unscented()}}.  A tuple key
        # ("GCV", ("x", "k", "w")) matches only node instances whose
        # interfaces are bound to variables of those names (the reference's
        # per-neighborhood form ``GCV(x, k, w) -> GCVMetadata(...)``).
        if meta:
            def _neighbor_names(f):
                names = set()
                for v in f.all_interfaces().values():
                    if isinstance(v, Ref):
                        names.add(v.var.name.split("/")[-1])
                return names

            for f in graph.factors:
                extra = meta.get(f.fform)
                for key, val in meta.items():
                    if (isinstance(key, tuple) and key[0] == f.fform
                            and set(key[1]) <= _neighbor_names(f)):
                        extra = val
                if extra is not None:
                    merged = dict(f.meta or {})
                    merged.update(extra if isinstance(extra, dict) else {"meta": extra})
                    f.meta = merged
        contract_deltas(graph)
        for f in graph.factors:
            if (
                len(getattr(f, "plates", ())) >= 2
                and f.out.var.kind == "random"
                and not isinstance(f.out.idx, tuple)
            ):
                raise NotImplementedError(
                    f"Nested-plate factor {f.fform} defines an anonymous "
                    f"latent ({f.out.var.name}): declare a grid latent "
                    "(z = rx.latent((N, M))) and assign z[i, j] = ... instead."
                )
        # Factorization constraints → factors forced to mean-field semantics
        # (reference @constraints q(x,y)=q(x)q(y) / MeanField(); the
        # VariationalConstraintsPlugin's factorization indices, SURVEY.md §2.2).
        self.mf_factor_ids = _mean_field_factor_ids(graph, constraints)
        self.infos = resolve_groups(graph)
        # index-ranged slot factorization (q(x)=q(x[begin])..q(x[end])):
        # non-chain arrays are slot-factored by construction; chains are exact
        # joint blocks, strictly tighter — refuse to degrade them silently.
        slot_specs = (
            getattr(constraints, "slot_factorized", None) or []
        ) if constraints else []
        normalize_transitions(graph, self.infos)
        self.chains = detect_chains(graph, self.infos)
        for name in slot_specs:
            if name not in {v.name for v in graph.random_variables()}:
                raise ValueError(
                    f"slot factorization names unknown variable {name!r}"
                )
            if name in self.chains:
                raise NotImplementedError(
                    f"q({name}) = q({name}[begin])..q({name}[end]) requested on "
                    "a chain variable: the engine solves chains exactly "
                    "(Kalman/forward-backward blocks), which is strictly "
                    "tighter than slot factorization. Remove the constraint."
                )
        init = dict(init or {})
        from ..graph.constraints import InitMessage

        # submodel-TYPE scoped init (reference `@initialization for init in
        # submodel`, src/model/plugins/initialization_plugin.jl:190-199):
        # a ("walk", "tau") tuple key applies to walk/tau, walk:2/tau, ... —
        # every instance of that submodel type.
        rv_names = {v.name for v in graph.random_variables()}
        for key in [k for k in init if isinstance(k, tuple)]:
            base, local = key
            val = init.pop(key)
            matched = [
                n for n in rv_names
                if n.endswith("/" + local)
                and n[: -len(local) - 1].split("/")[-1].split(":")[0] == base
            ]
            if not matched:
                raise ValueError(
                    f"initialization block ({base!r}, {local!r}) matches no "
                    "variable in the model."
                )
            for n in matched:
                init.setdefault(n, val)
        # submodel default_init (reference GraphPPL.default_init,
        # initialization_plugin_tests.jl:1161-1186): fills instances the
        # user's initialization= did not target — setdefault = user wins.
        d_init = getattr(graph, "default_submodel_init", None)
        if d_init:
            for base, spec in d_init.items():
                for local, val in spec.items():
                    for n in rv_names:
                        if (
                            n.endswith("/" + local)
                            and n[: -len(local) - 1].split("/")[-1]
                                .split(":")[0] == base
                        ):
                            init.setdefault(n, val)
        init = {
            k: (v.dist if isinstance(v, InitMessage) else v)
            for k, v in init.items()
        }
        unknown = set(init) - {v.name for v in graph.random_variables()}
        if unknown:
            raise ValueError(f"initialization given for unknown variables {unknown}")
        self.sweep, auto_init = schedule_sweep(graph, self.chains, set(init))
        from ..dists.natural import family_key as _family_key

        for name in sorted(auto_init - set(init)):
            gi = self.infos[name]
            seed = _prior_init(graph, name)
            if seed is not None:
                # the seed must live in the group's conjugate family — a
                # Mixture out-message, for example, is mixture-valued where
                # downstream rules need a plain carrier
                try:
                    if _family_key(seed) != gi.family:
                        seed = None
                except Exception:  # noqa: BLE001 — unregistered carriers
                    seed = None
            init[name] = (seed if seed is not None
                          else _vague_for(gi.family, gi.event_shape))
        self.init = init
        # reference ReactiveMPInferenceOptions surface
        # (src/model/plugins/reactivemp_inference.jl:126-180): unknown options
        # error with the available set.  `limit_stack_depth` is accepted and
        # ignored — no recursion exists in this engine (SURVEY.md §2.3);
        # `force_marginal_computation` likewise: every requested marginal is
        # computed by the static schedule.
        known = {"parallel_scans", "rulefallback", "check_objective", "warn",
                 "limit_stack_depth", "force_marginal_computation",
                 "fused_kernels", "hbm_budget_bytes", "fused_moment_dtype",
                 "matmul_precision", "observation_dtype"}
        # reference-accepted options that are TOP-LEVEL infer kwargs here
        # (reactivemp_inference.jl:129-137): redirect with a pointed error
        # rather than silently accepting or claiming they're unknown.
        redirected = {"annotations", "callbacks", "stream_postprocessors"}
        misplaced = set(options) & redirected
        if misplaced:
            raise ValueError(
                f"Options {sorted(misplaced)} are top-level infer() keyword "
                "arguments in this framework (annotations=, callbacks=, "
                "postprocess=); pass them there instead of inside options=."
            )
        unknown = set(options) - known
        if unknown:
            raise ValueError(
                f"Unknown inference options {sorted(unknown)}; available: "
                f"{sorted(known)}."
            )
        self.warn = options.get("warn", True)
        self.use_parallel = options.get("parallel_scans", True)
        # batched programs lower eligible chain blocks to the fused Pallas
        # kernel tier (engine/batched.py); False forces the XLA scan paths
        self.use_fused = options.get("fused_kernels", True)
        self.hbm_budget = options.get("hbm_budget_bytes", 12_000_000_000)
        # "bfloat16": the fused smoother streams its HBM-resident covariance/
        # cross moments in bf16 (~30% less traffic on the HBM-bound kernel;
        # means and arithmetic stay fp32) — ops/pallas_smoother.py
        self.fused_moment_dtype = options.get("fused_moment_dtype", "float32")
        # "int8"/"float8_e4m3fn": batched-program observation ingest is
        # quantized per observation row (ops/quantized.py) — the chain-
        # evidence xi einsum reads the 1-byte payload + per-row scales
        # instead of the fp32 observations every sweep, and every other
        # consumer (Bethe FE) sees the same dequantized ŷ (inference on
        # quantized observations, consistently).  SURVEY §2.3 item (e);
        # BASELINE "optional int8/fp8 quantized natural parameters".
        self.observation_dtype = options.get("observation_dtype", "float32")
        if self.observation_dtype not in ("float32", "int8", "float8_e4m3fn"):
            raise ValueError(
                f"observation_dtype {self.observation_dtype!r} not supported;"
                " choose 'float32', 'int8', or 'float8_e4m3fn'."
            )
        # strict accuracy mode: options={"matmul_precision": "highest"} traces
        # every program under jax.default_matmul_precision — TPU matmuls then
        # run full-fp32 passes instead of the default bf16-ish fast path,
        # buying back the ~5e-3 on-chip posterior error when it matters
        self.matmul_precision = options.get("matmul_precision")
        # reference: infer(options=(rulefallback=NodeFunctionRuleFallback(),))
        self.rulefallback = options.get("rulefallback")
        # reference: ObjectiveDiagnosticCheckNaNs/Infs (src/score/diagnostics.jl)
        self.check_objective = options.get("check_objective", False)

        # Build executable blocks in sweep order.
        self.blocks: list[tuple[str, Any]] = []
        varmap = {v.name: v for v in graph.random_variables()}
        chain_factor_ids = set()
        for spec in self.chains.values():
            chain_factor_ids.add(id(spec.transition))
        for name in self.sweep:
            var = varmap[name]
            if name in self.chains:
                spec = self.chains[name]
                shape = self.infos[name].event_shape
                if spec.kind in ("gaussian", "ar", "gcv"):
                    scalar = shape == ()
                    dim = 1 if scalar else shape[0]
                    cls = {"ar": ARChainBlock, "gcv": GCVChainBlock,
                           "gaussian": GaussianChainBlock}[spec.kind]
                    block = cls(
                        var, dim, scalar, spec.prior, spec.transition,
                        spec.evidence, self.use_parallel,
                    )
                else:
                    block = DiscreteChainBlock(
                        var, shape[0], spec.prior, spec.transition,
                        spec.evidence, self.use_parallel,
                    )
                self.blocks.append(("chain", block))
            else:
                adjacency = []
                for f in graph.factors:
                    # no break: a factor touching the variable at SEVERAL
                    # interfaces (a lagged transition solved by the Jacobi
                    # fallback: out = x[t], in = x[t-1]) sends a message from
                    # EACH of them — dropping one turns smoothing into
                    # filtering
                    for iface, v in f.all_interfaces().items():
                        if isinstance(v, Ref) and v.var is var:
                            adjacency.append((f, iface))
                from ..graph.constraints import as_form_constraint

                form = mform = None
                if constraints is not None and getattr(constraints, "forms", None):
                    form = as_form_constraint(constraints.forms.get(name))
                if constraints is not None and getattr(
                        constraints, "message_forms", None):
                    mform = as_form_constraint(
                        constraints.message_forms.get(name))
                rule_overrides = {}
                for f, iface in adjacency:
                    # Validate rules exist now (compile-time rule resolution);
                    # missing rules resolve through the configured fallback.
                    try:
                        get_message_rule(f.fform, iface)
                    except RuleNotFoundError:
                        if self.rulefallback is None:
                            raise
                        rule_overrides[(f.id, iface)] = (
                            self.rulefallback.make_rule(f.fform, iface)
                        )
                group = PlainGroup(var, self.infos[name].family, adjacency,
                                   form_constraint=form,
                                   mf_ids=self.mf_factor_ids,
                                   rule_overrides=rule_overrides,
                                   message_form=mform)
                self.blocks.append(("plain", group))

        # rx.infer(mesh=Mesh(..., ("time",))): shard every eligible Gaussian
        # chain over the mesh's time axis — the block then runs the
        # distributed associative scan (parallel/time_blocked.py: shard-local
        # scans + one O(P·d²) all-gather over ICI), exact vs the local
        # smoother (SURVEY §2.3 strategy 3, engine-reachable).
        if time_mesh is not None:
            n_shards = int(time_mesh.shape[time_axis])
            any_sharded = False
            for kind, block in self.blocks:
                if kind != "chain":
                    continue
                if not isinstance(block, GaussianChainBlock):
                    if options.get("warn", True):
                        import warnings

                        warnings.warn(
                            f"infer(mesh=...): chain {block.var.name!r} is "
                            "discrete — time sharding covers Gaussian/AR/GCV "
                            "chains; this chain runs replicated.",
                            stacklevel=3,
                        )
                    continue
                length = block.var.length
                if length % n_shards != 0 and options.get("warn", True):
                    import warnings

                    # pad-to-multiple (round-5): the block pads the tail
                    # with identity transitions + zero-precision evidence
                    # and slices the results — exact, slightly wasteful
                    warnings.warn(
                        f"infer(mesh=...): chain {block.var.name!r} length "
                        f"{length} is not divisible by the {time_axis!r} "
                        f"axis size {n_shards}; the tail is padded to "
                        f"{length + (-length) % n_shards} (exact results, "
                        f"{(-length) % n_shards} wasted slots).",
                        stacklevel=3,
                    )
                block.time_mesh = time_mesh
                block.time_axis = time_axis
                any_sharded = True
            if not any_sharded:
                raise ValueError(
                    "infer(mesh=...) with a time axis: no chain in this model "
                    "is eligible for time sharding (need a Gaussian/AR/GCV "
                    f"chain with length divisible by {n_shards}). Use "
                    "infer_batched(mesh=...) for data-parallel sharding of "
                    "independent datasets instead."
                )

        # Free-energy plan (built lazily: some nodes, e.g. Delta, define no
        # average energy and should only fail if free_energy=True is requested).
        self._chain_factor_ids = chain_factor_ids
        self._fe_factors = None
        self.degrees = {
            v.name: slot_degrees(graph, v) for v in graph.random_variables()
        }

        self._jitted: dict = {}
        self._plan_report: Optional[dict] = None

    def plan_report(self) -> dict:
        """Per-chain-block kernel-lowering report of the last batched program:
        ``{var: {"fused": bool, "kernel": ... | "reason": ...}}``.  Populated
        by ``make_batched_program``/``rx.batched_program``/``infer_batched``
        (engine/batched.py build_plans); raises before any batched lowering
        ran — the single-dataset program has no kernel tier to report."""
        if self._plan_report is None:
            raise ValueError(
                "plan_report() is available after a batched program was "
                "built (rx.batched_program / rx.infer_batched); the "
                "single-dataset path does not lower to the fused kernel tier."
            )
        return dict(self._plan_report)

    # -- execution -----------------------------------------------------------------
    def _init_state(self) -> dict:
        state = {}
        for name, spec in self.init.items():
            var = next(v for v in self.graph.random_variables() if v.name == name)
            d = spec() if callable(spec) else spec
            if var.grid_axes:
                d = jax.tree_util.tree_map(
                    lambda a: jnp.broadcast_to(
                        jnp.asarray(a, jnp.float32),
                        tuple(var.grid_axes) + jnp.shape(jnp.asarray(a)),
                    ),
                    d,
                )
            elif var.is_array:
                # broadcast scalar init across slots
                d = jax.tree_util.tree_map(
                    lambda a: jnp.broadcast_to(
                        jnp.asarray(a, jnp.float32),
                        (var.length,) + jnp.shape(jnp.asarray(a)),
                    ),
                    d,
                )
            state[name] = d
        return state

    def variable_outbound_message(self, state: dict, data: dict, varname: str):
        """μ(x): the outbound message from variable x along its LAST edge —
        marginal ÷ message from the last-attached factor (reference
        ``get_stream_of_outbound_messages(var, degree(var))``,
        src/inference/autoupdates.jl:605-607; used by μ() autoupdate args).

        Chain-block variables (Kalman/forward-backward chains) return the
        per-slot outbound array: marginal ÷ the last evidence factor's
        message at every slot (the plate DSL folds a loop into one factor
        object, so "last edge" is the last factor in graph order — for the
        canonical SSM form this is the observation likelihood, making μ(x)
        the leave-own-evidence-out smoothed state)."""
        from ..dists.natural import nat_div
        from .blocks import build_q, factor_data_mask, mask_message

        for kind, block in self.blocks:
            if block.var.name != varname:
                continue
            if kind == "plain":
                f, iface = block.adjacency[-1]
                rule = block.rule_overrides.get((f.id, iface)) or \
                    get_message_rule(f.fform, iface, vmp=f.id in block.mf_ids)
                from ..rules.registry import get_node

                needs_self = getattr(get_node(f.fform),
                                     "needs_self_marginal", False)
                q = build_q(f, state, data,
                            exclude=None if needs_self else iface)
                msg = mask_message(rule(q), factor_data_mask(f, data))
                return nat_div(state[varname], msg)
            return self._chain_outbound_message(block, state, data)
        raise ValueError(
            f"mu({varname}): the model has no random variable named "
            f"{varname!r}."
        )

    def _chain_outbound_message(self, block, state: dict, data: dict):
        """Per-slot μ for a chain block: marginal ÷ last evidence message."""
        from .blocks import DiscreteChainBlock, GaussianChainBlock

        spec = self.chains[block.var.name]
        order = {id(f): i for i, f in enumerate(self.graph.factors)}
        if not spec.evidence:
            raise NotImplementedError(
                f"mu({block.var.name}): the chain has no evidence factors; "
                "its last edge is the transition, whose outbound is the "
                "filtered forward message — use the filtering model form "
                "instead (reference performance-tips.md:36-38)."
            )
        f, iface = max(spec.evidence, key=lambda fi: order[id(fi[0])])
        if order[id(spec.transition)] > order[id(f)] or (
            order[id(spec.prior)] > order[id(f)]
        ):
            raise NotImplementedError(
                f"mu({block.var.name}): the chain's last-created factor is "
                "its prior/transition; per-edge messages toward transitions "
                "are not exposed (write the observation plate last, or use "
                "q() arguments)."
            )
        ref = f.out if iface == "out" else f.interfaces[iface]
        cov = _coverage(f, ref)
        length = block.var.length
        if cov != (0, length):
            raise NotImplementedError(
                f"mu({block.var.name}): the last evidence factor covers "
                f"slots {cov}, not the full chain; partial-coverage μ is "
                "not supported."
            )
        marg = state[block.var.name]
        if isinstance(block, DiscreteChainBlock):
            from ..dists import Categorical

            rule = get_message_rule(f.fform, iface)
            q = build_q(f, state, data, exclude=iface, chain_cross=None)
            msg = rule(q)
            logits = msg.logits
            from .blocks import factor_data_mask

            mask = factor_data_mask(f, data)
            if mask is not None:
                logits = logits * mask.reshape(
                    mask.shape + (1,) * (logits.ndim - mask.ndim)
                )
            return Categorical(marg.logits - logits)
        assert isinstance(block, GaussianChainBlock)
        mxi, mw, _ = block._evidence_msg(f, iface, state, data, None)
        from ..dists import (
            MvNormalWeightedMeanPrecision,
            NormalWeightedMeanPrecision,
        )
        from ..dists.gaussian import (
            as_mv_weighted_mean_precision,
            as_weighted_mean_precision,
        )

        if block.scalar:
            nat = as_weighted_mean_precision(marg)
            return NormalWeightedMeanPrecision(
                nat.xi - mxi[..., 0], nat.w - mw[..., 0, 0]
            )
        nat = as_mv_weighted_mean_precision(marg)
        return MvNormalWeightedMeanPrecision(nat.xi - mxi, nat.w - mw)

    def _with_derived(self, data: dict) -> dict:
        """Extend the data dict with folded data expressions (`a + b` over
        data variables, graph.derived_data).  Idempotent; evaluated in
        insertion order so derived-of-derived chains resolve."""
        dd = getattr(self.graph, "derived_data", None)
        if not dd:
            return data
        out = dict(data)
        for name, fn in dd.items():
            if name not in out:
                out[name] = fn(out)
        return out

    def _sweep_once(self, state: dict, chain_cross: dict, data: dict):
        from ..rules.registry import trace_messages

        data = self._with_derived(data)
        for kind, block in self.blocks:
            if kind == "chain":
                trace_messages.record(
                    node=f"<chain:{type(block).__name__}>",
                    interface=block.var.name, mean_field=False,
                )
                marg, cross = block.update(state, data, chain_cross)
                state[block.var.name] = marg
                # store rule-ready joint: Cov(out, in) for Gaussian, xis for discrete
                if isinstance(block, GaussianChainBlock):
                    chain_cross[block.var.name] = (
                        cross if block.scalar else jnp.swapaxes(cross, -1, -2)
                    )
                else:
                    chain_cross[block.var.name] = cross
            else:
                state[block.var.name] = block.update(state, data, chain_cross)
        return state, chain_cross

    @property
    def fe_factors(self):
        if self._fe_factors is None:
            self._fe_factors = [
                FactorFE(
                    f,
                    is_chain_transition=id(f) in self._chain_factor_ids,
                    chain_scalar=(
                        self.infos[f.out.var.name].event_shape == ()
                        if f.out.var.kind == "random" and f.out.var.name in self.chains
                        else False
                    ),
                    mean_field=f.id in self.mf_factor_ids,
                    event_shape=(
                        self.infos[f.out.var.name].event_shape
                        if f.out.var.kind == "random"
                        and f.out.var.name in self.infos else None
                    ),
                )
                for f in self.graph.factors
            ]
        return self._fe_factors

    def _free_energy(self, state, chain_cross, data):
        data = self._with_derived(data)
        total = variable_entropy_term(self.graph, state, self.degrees)
        for ffe in self.fe_factors:
            total = total + ffe(state, data, chain_cross)
        return total

    def make_program(self, iterations: int, free_energy: bool, keep_each: bool):
        """Build the pure function (data_dict) -> (posteriors, fe, history).

        The first sweep runs eagerly in the trace (it establishes the state
        structure); remaining iterations are a ``lax.scan`` so compile time is
        O(1) in the iteration count — including keep_each, whose per-iteration
        marginals ride the scan's stacked outputs (message caches are dropped
        from the history to bound its footprint)."""

        def snapshot(st: dict) -> dict:
            return {k: v for k, v in st.items() if not k.startswith("_msg:")}

        def program(data: dict):
            state = self._init_state()
            chain_cross: dict = {}
            history = []
            state, chain_cross = self._sweep_once(state, chain_cross, data)
            fe0 = (
                self._free_energy(state, chain_cross, data)
                if free_energy
                else jnp.zeros(())
            )
            if keep_each:
                history.append(snapshot(state))
            if iterations > 1:
                def body(carry, _):
                    st, cr = carry
                    st, cr = self._sweep_once(dict(st), dict(cr), data)
                    f = (
                        self._free_energy(st, cr, data)
                        if free_energy
                        else jnp.zeros(())
                    )
                    ys = (snapshot(st), f) if keep_each else f
                    return (st, cr), ys

                (state, chain_cross), ys = jax.lax.scan(
                    body, (state, chain_cross), None, length=iterations - 1
                )
                stacked, fes_rest = ys if keep_each else (None, ys)
                fe_arr = (
                    jnp.concatenate([fe0[None], fes_rest])
                    if free_energy
                    else jnp.zeros((0,))
                )
                if keep_each:
                    history.extend(
                        jax.tree_util.tree_map(lambda a, _i=i: a[_i], stacked)
                        for i in range(iterations - 1)
                    )
            else:
                fe_arr = fe0[None] if free_energy else jnp.zeros((0,))
            return state, fe_arr, history

        return program

    def predict(self, state: dict, data: dict, varname: str,
                structured: bool = False):
        """Posterior-predictive distribution of a data variable's slots: the
        defining factor's forward message under the posterior marginals
        (reference: predictvars / feeding missing, src/inference/batch.jl:216-246,
        432-437).

        ``structured=True`` (data wrapped in UnfactorizedData,
        src/model/model.jl:16-31): the missing entries behave as latents kept
        *jointly* with the factor's inputs, so the prediction is the exact BP
        marginalization (``message_to_out_structured``) rather than the
        moment-matched VMP out-message when the node distinguishes the two."""
        data = self._with_derived(data)
        var = self.graph.data_vars[varname]
        factors = [f for f in self.graph.factors if f.out.var is var]
        if len(factors) != 1:
            raise ValueError(
                f"predictvars: data variable {varname} has {len(factors)} defining "
                "factors; prediction needs exactly one."
            )
        f = factors[0]
        rule = None
        if structured:
            from ..rules.registry import get_node

            rule = getattr(get_node(f.fform), "message_to_out_structured", None)
        if rule is None:
            rule = get_message_rule(f.fform, "out")
        q = build_q(f, state, data, exclude="out", chain_cross=None)
        return rule(q)

    def make_batched_program(self, data0: dict, iterations: int,
                             free_energy: bool, keep_each: bool = False,
                             all_finite: bool = True, shared: tuple = (),
                             psum_axis: Optional[str] = None,
                             batch_hint: Optional[int] = None):
        """Batch-native program over B independent datasets: eligible chain
        blocks dispatch into the fused Pallas kernels, the rest is vmapped
        (engine/batched.py — the kernel-tier path of infer_batched).
        ``shared`` variables are aggregated ACROSS the batch (natural-param
        sums, psum over ``psum_axis`` under shard_map)."""
        from .batched import make_batched_program

        return make_batched_program(
            self, data0, iterations, free_energy,
            keep_each=keep_each, all_finite=all_finite, shared=shared,
            psum_axis=psum_axis, batch_hint=batch_hint,
        )

    def make_tick_program(self, iterations: int, free_energy: bool,
                          keep_each: bool, cold: bool):
        """Streaming-tick program with PERSISTENT marginals (reference: the
        engine's marginal streams keep their latest values across
        observations — only the autoupdated priors change per tick,
        src/inference/streaming.jl:311-436).

        ``cold=True``: start from the initialization (first tick; the eager
        first sweep establishes the state structure) and return the carry.
        ``cold=False``: (data, state, chain_cross) → all iterations under one
        ``lax.scan``, warm-starting from the previous tick's carry."""

        def snapshot(st: dict) -> dict:
            return {k: v for k, v in st.items() if not k.startswith("_msg:")}

        def scan_sweeps(state, chain_cross, data, n, fe_head):
            def body(carry, _):
                st, cr = carry
                st, cr = self._sweep_once(dict(st), dict(cr), data)
                f = (
                    self._free_energy(st, cr, data)
                    if free_energy else jnp.zeros(())
                )
                ys = (snapshot(st), f) if keep_each else f
                return (st, cr), ys

            history: list = []
            if n > 0:
                (state, chain_cross), ys = jax.lax.scan(
                    body, (state, chain_cross), None, length=n
                )
                stacked, fes = ys if keep_each else (None, ys)
                if keep_each:
                    history = [
                        jax.tree_util.tree_map(lambda a, _i=i: a[_i], stacked)
                        for i in range(n)
                    ]
            else:
                fes = jnp.zeros((0,))
            fe_arr = (
                jnp.concatenate([fe_head, fes]) if free_energy
                else jnp.zeros((0,))
            )
            return state, chain_cross, fe_arr, history

        if cold:
            def program(data: dict):
                state = self._init_state()
                chain_cross: dict = {}
                state, chain_cross = self._sweep_once(state, chain_cross, data)
                fe0 = (
                    self._free_energy(state, chain_cross, data)[None]
                    if free_energy else jnp.zeros((0,))
                )
                head_hist = [snapshot(state)] if keep_each else []
                state, chain_cross, fe_arr, history = scan_sweeps(
                    state, chain_cross, data, iterations - 1, fe0
                )
                return state, fe_arr, head_hist + history, chain_cross
        else:
            def program(data: dict, state: dict, chain_cross: dict):
                return_state, chain_cross, fe_arr, history = scan_sweeps(
                    dict(state), dict(chain_cross), data, iterations,
                    jnp.zeros((0,)),
                )
                return return_state, fe_arr, history, chain_cross

        return program

    def run_tick(self, data: dict, iterations: int, free_energy: bool,
                 keep_each: bool = False, carry=None):
        """Execute one streaming tick; ``carry`` is the previous tick's
        ``(state, chain_cross)`` or None for a cold start.  Returns
        ``(state, fe, history, carry')``."""
        data = {k: as_f32_device(v)
                for k, v in data.items()}
        cold = carry is None
        key = ("tick", cold, iterations, free_energy, keep_each)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(
                self.make_tick_program(iterations, free_energy, keep_each,
                                       cold)
            )
        if cold:
            state, fe, history, cross = self._jitted[key](data)
        else:
            state, fe, history, cross = self._jitted[key](
                data, carry[0], carry[1]
            )
        return state, fe, history, (state, cross)

    def make_sweep_fn(self, free_energy: bool):
        """One jitted VMP sweep as a pure carry function (host-loop mode for
        per-iteration callbacks / early stopping)."""

        def fn(carry, data):
            state, chain_cross = dict(carry[0]), dict(carry[1])
            state, chain_cross = self._sweep_once(state, chain_cross, data)
            fe = (
                self._free_energy(state, chain_cross, data)
                if free_energy
                else jnp.zeros(())
            )
            return (state, chain_cross), fe

        return fn

    def _prec_ctx(self):
        """Trace-time matmul-precision context (strict-fp32 accuracy mode)."""
        from contextlib import nullcontext

        return (jax.default_matmul_precision(self.matmul_precision)
                if self.matmul_precision else nullcontext())

    def run_iterative(self, data: dict, iterations: int, free_energy: bool,
                      registry, keep_each: bool = False):
        """Host-driven iteration loop firing per-iteration callbacks (reference
        batch hot loop, src/inference/batch.jl:391-430); each sweep is one
        compiled XLA program."""
        data = {k: as_f32_device(v) for k, v in data.items()}
        key = ("sweep", free_energy)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(self.make_sweep_fn(free_energy))
        fn_raw = self._jitted[key]

        def fn(carry, d):
            # trace-time setting: applies on the first (tracing) call
            with self._prec_ctx():
                return fn_raw(carry, d)

        carry = (self._init_state(), {})
        fes, history = [], []
        for i in range(iterations):
            registry.invoke("before_iteration", iteration=i)
            carry, fe = fn(carry, data)
            if free_energy:
                fes.append(fe)
            if keep_each:
                history.append(dict(carry[0]))
            fe_host = float(fe) if free_energy else None
            if free_energy and self.check_objective and not np.isfinite(fe_host):
                raise FloatingPointError(
                    f"Bethe free energy became non-finite at iteration {i} "
                    f"({fe_host}). Reference diagnostic: ObjectiveDiagnosticCheck"
                    "NaNs/Infs (src/score/diagnostics.jl) — check the model "
                    "parametrization and initialization."
                )
            ev = registry.invoke(
                "after_iteration",
                iteration=i,
                free_energy=fe_host,
            )
            if ev.stop_iteration:
                break
        fe_arr = jnp.stack(fes) if fes else jnp.zeros((0,))
        return carry[0], fe_arr, history

    def run(self, data: dict, iterations: int = 1, free_energy: bool = False,
            keep_each: bool = False, jit: bool = True):
        key = (iterations, free_energy, keep_each)
        data = {k: as_f32_device(v) for k, v in data.items()}
        if jit:
            if key not in self._jitted:
                self._jitted[key] = jax.jit(
                    self.make_program(*key)
                )
            fn = self._jitted[key]
        else:
            fn = self.make_program(*key)
        with self._prec_ctx():
            return fn(data)
