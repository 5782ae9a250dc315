"""Distribution substrate (L0) — exponential-family distributions as JAX pytrees.

TPU-native replacement for the reference's BayesBase/ExponentialFamily/Distributions
layer (see /root/reference docs: re-exported at src/RxInfer.jl:5-6; product strategies
documented at docs/src/manuals/inference/create-node.md:197-207).

Design:
  * Every distribution is a frozen dataclass registered as a JAX pytree.  Fields are
    arrays (possibly with leading batch dimensions); event shape is trailing.
  * ``prod(a, b)`` is the closed-form same/compatible-family product — for exponential
    families it is natural-parameter addition.  This is the mathematical core that makes
    message passing TPU-friendly: message products are elementwise adds over stacked
    natural parameters, and shared-parameter accumulation across shards is a ``psum``.
  * ``vague(cls, ...)`` produces non-informative initializers (reference: ``vague(T)``
    with ``huge``/``tiny`` constants).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Type, TypeVar

import jax
import jax.numpy as jnp

# Reference uses huge = 1e12, tiny = 1e-12 (ReactiveMP constants).
HUGE = 1e12
TINY = 1e-12

_T = TypeVar("_T")

_DIST_REGISTRY: dict[str, type] = {}


def dist_dataclass(cls: Type[_T]) -> Type[_T]:
    """Register a distribution dataclass as a JAX pytree node.

    All dataclass fields are treated as array leaves (traced); there are no static
    fields — shape information is carried by the arrays themselves, which keeps every
    distribution ``vmap``/``scan``/``shard_map`` compatible.
    """
    cls = dataclasses.dataclass(frozen=True, repr=False)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return tuple(getattr(obj, name) for name in fields), None

    def flatten_with_keys(obj):
        return (
            tuple((jax.tree_util.GetAttrKey(n), getattr(obj, n)) for n in fields),
            None,
        )

    def unflatten(aux, children):
        del aux
        return cls(*children)

    jax.tree_util.register_pytree_with_keys(cls, flatten_with_keys, unflatten, flatten)

    def _repr(self):
        parts = []
        for name in fields:
            v = getattr(self, name)
            parts.append(f"{name}={v}")
        return f"{cls.__name__}({', '.join(parts)})"

    cls.__repr__ = _repr  # type: ignore[assignment]
    _DIST_REGISTRY[cls.__name__] = cls
    return cls


class Distribution:
    """Marker base class for all distributions.

    Subclasses implement (where meaningful): ``mean``, ``var``/``cov``, ``logpdf``,
    ``entropy``, ``natural_params``, ``from_natural``, and class-level ``vague``.
    """

    # --- statistics -------------------------------------------------------------
    def mean(self):  # noqa: D102
        raise NotImplementedError(type(self).__name__)

    def var(self):  # noqa: D102
        raise NotImplementedError(type(self).__name__)

    def cov(self):  # noqa: D102
        return self.var()

    def mode(self):  # noqa: D102
        raise NotImplementedError(type(self).__name__)

    def entropy(self):  # noqa: D102
        raise NotImplementedError(type(self).__name__)

    def logpdf(self, x):  # noqa: D102
        raise NotImplementedError(type(self).__name__)

    def sample(self, key, shape=()):  # noqa: D102
        raise NotImplementedError(type(self).__name__)

    # --- event metadata ---------------------------------------------------------
    @property
    def event_ndim(self) -> int:
        """Number of trailing event dimensions (0 for scalar families)."""
        return 0

    def batch_shape(self):
        raise NotImplementedError(type(self).__name__)


# ---------------------------------------------------------------------------------
# Generic functions mirroring the reference's BayesBase statistics surface
# (mean, var, cov, precision, mean_cov, weightedmean, mean(log, d), …)
# ---------------------------------------------------------------------------------

def mean(d: Distribution):
    return d.mean()


def var(d: Distribution):
    return d.var()


def cov(d: Distribution):
    return d.cov()


def std(d: Distribution):
    return jnp.sqrt(d.var())


def mode(d: Distribution):
    return d.mode()


def precision(d: Distribution):
    return d.precision()  # type: ignore[attr-defined]


def entropy(d: Distribution):
    return d.entropy()


def logpdf(d: Distribution, x):
    return d.logpdf(x)


def mean_var(d: Distribution):
    return d.mean(), d.var()


def mean_cov(d: Distribution):
    return d.mean(), d.cov()


def mean_precision(d: Distribution):
    return d.mean(), d.precision()  # type: ignore[attr-defined]


def weightedmean(d: Distribution):
    return d.weightedmean()  # type: ignore[attr-defined]


def mean_log(d: Distribution):
    """E[log x] — reference: ``mean(log, d)``."""
    return d.mean_log()  # type: ignore[attr-defined]


def mean_mirrorlog(d: Distribution):
    """E[log (1 - x)] — reference: ``mean(mirrorlog, d)``."""
    return d.mean_mirrorlog()  # type: ignore[attr-defined]


# ---------------------------------------------------------------------------------
# Products
# ---------------------------------------------------------------------------------

class ProductError(TypeError):
    """No closed-form product between the two distribution families.

    Mirrors the reference's unresolved ``ProductOf`` error path
    (src/constraints/form/form_ensure_supported.jl:15-54)."""


_PROD_TABLE: dict[tuple[type, type], Callable[[Any, Any], Any]] = {}


def register_prod(t1: type, t2: type, symmetric: bool = True):
    """Register a closed-form pairwise product for a pair of families."""

    def deco(fn):
        _PROD_TABLE[(t1, t2)] = fn
        if symmetric and t1 is not t2:
            _PROD_TABLE[(t2, t1)] = lambda a, b: fn(b, a)
        return fn

    return deco


def prod(a: Distribution, b: Distribution) -> Distribution:
    """Closed-form product of two distributions (normalized).

    Reference: ``prod(::GenericProd, d1, d2)`` multiple dispatch — here an explicit
    registry resolved statically at schedule-compile time (every lookup happens at
    trace time, never inside the compiled XLA program)."""
    fn = _PROD_TABLE.get((type(a), type(b)))
    if fn is None:
        raise ProductError(
            f"No closed-form product for {type(a).__name__} × {type(b).__name__}. "
            "Use a functional form constraint (PointMassFormConstraint / "
            "SampleListFormConstraint / ProjectedTo) to approximate it."
        )
    return fn(a, b)


def has_closed_form_prod(t1: type, t2: type) -> bool:
    return (t1, t2) in _PROD_TABLE


def vague(cls: type, *args, **kwargs):
    """Non-informative instance of a family (reference: ``vague(T)``)."""
    return cls.vague(*args, **kwargs)  # type: ignore[attr-defined]


# ---------------------------------------------------------------------------------
# CountingReal — ∞-entropy bookkeeping
# ---------------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class CountingReal:
    """A real number plus a signed count of infinities.

    Reference: BayesBase.CountingReal used by the free-energy plugin
    (src/model/plugins/reactivemp_free_energy.jl:108-123,186-187) so that the -∞
    entropies of PointMass data/const variables cancel the +∞ point entropies counted
    per degree.  In the AOT compiler this bookkeeping happens at *compile time*: the
    schedule verifies the counts cancel and the XLA program only ever sums finite
    terms.
    """

    value: float
    infinities: int = 0

    def __add__(self, other):
        if isinstance(other, CountingReal):
            return CountingReal(self.value + other.value, self.infinities + other.infinities)
        return CountingReal(self.value + other, self.infinities)

    def __sub__(self, other):
        if isinstance(other, CountingReal):
            return CountingReal(self.value - other.value, self.infinities - other.infinities)
        return CountingReal(self.value - other, self.infinities)

    def is_finite(self) -> bool:
        return self.infinities == 0

    def float(self) -> float:
        if self.infinities > 0:
            return float("inf")
        if self.infinities < 0:
            return float("-inf")
        return self.value
