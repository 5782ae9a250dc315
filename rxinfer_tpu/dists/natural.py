"""Natural-parameter views: product-reduction, padding, batched products.

The algebraic core of TPU-native message passing: a product of N conjugate
messages is a *sum of natural parameters* — one vectorized add/reduction (VPU),
or a ``psum`` when messages live on different shards (SURVEY.md §2.3: "conjugate
updates are additive in natural params — this is the key mathematical fact that
makes message passing collective-friendly").

For every family we define (to_nat, from_nat, canonical_cls) such that
  prod(d1, d2) == from_nat(to_nat(d1) + to_nat(d2))
and the ZERO natural vector is the multiplicative identity (a flat/improper
carrier), which makes padding plated message arrays trivial.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Distribution
from .discrete import Categorical, Dirichlet, DirichletCollection
from .gaussian import (
    AbstractMvNormal,
    AbstractNormal,
    MvNormalWeightedMeanPrecision,
    NormalWeightedMeanPrecision,
    as_mv_weighted_mean_precision,
    as_weighted_mean_precision,
    pd_inverse,
)
from .matrix import InverseWishart, Wishart, WishartInverseScale
from .scalar_families import (
    Bernoulli,
    BernoulliLogits,
    Beta,
    GammaShapeRate,
    GammaShapeScale,
    InverseGamma,
    Poisson,
)

# family key -> (to_nat(d) -> tuple, from_nat(tuple) -> d)
# Natural tuples are plain tuples of arrays (pytrees), additive under products.


def _gauss_to(d: AbstractNormal):
    f = as_weighted_mean_precision(d)
    return (f.xi, f.w)


def _mv_gauss_to(d: AbstractMvNormal):
    f = as_mv_weighted_mean_precision(d)
    return (f.xi, f.w)


_TABLE = {
    "gaussian": (
        _gauss_to,
        lambda n: NormalWeightedMeanPrecision(n[0], n[1]),
    ),
    "mv_gaussian": (
        _mv_gauss_to,
        lambda n: MvNormalWeightedMeanPrecision(n[0], n[1]),
    ),
    "beta": (
        lambda d: (d.a - 1.0, d.b - 1.0),
        lambda n: Beta(n[0] + 1.0, n[1] + 1.0),
    ),
    "bernoulli": (
        lambda d: (
            (d.logit,)
            if isinstance(d, BernoulliLogits)
            else (jnp.log(d.p) - jnp.log1p(-d.p),)
        ),
        lambda n: BernoulliLogits(n[0]),
    ),
    "gamma": (
        lambda d: (d.shape_rate()[0] - 1.0, d.shape_rate()[1]),
        lambda n: GammaShapeRate(n[0] + 1.0, n[1]),
    ),
    "inverse_gamma": (
        lambda d: (d.a + 1.0, d.b),
        lambda n: InverseGamma(n[0] - 1.0, n[1]),
    ),
    "dirichlet": (
        lambda d: (d.alpha - 1.0,),
        lambda n: Dirichlet(n[0] + 1.0),
    ),
    "dirichlet_collection": (
        lambda d: (d.alpha - 1.0,),
        lambda n: DirichletCollection(n[0] + 1.0),
    ),
    "categorical": (
        lambda d: (d.logits,),
        lambda n: Categorical(n[0]),
    ),
    "wishart": (
        lambda d: (
            (d.nu - d.s_inv.shape[-1] - 1.0, d.s_inv)
            if isinstance(d, WishartInverseScale)
            else (d.nu - d.s.shape[-1] - 1.0, pd_inverse(d.s))
        ),
        # keep the inverse-scale carrier: per-copy natural matrices may be
        # singular; only the aggregated posterior is converted (to_wishart()).
        lambda n: WishartInverseScale(n[0] + n[1].shape[-1] + 1.0, n[1]),
    ),
    "inverse_wishart": (
        lambda d: (d.nu + d.psi.shape[-1] + 1.0, d.psi),
        lambda n: InverseWishart(n[0] - n[1].shape[-1] - 1.0, n[1]),
    ),
    "poisson": (
        lambda d: (jnp.log(d.lam),),
        lambda n: Poisson(jnp.exp(n[0])),
    ),
}


def family_key(d: Distribution) -> str:
    if isinstance(d, AbstractMvNormal):
        return "mv_gaussian"
    if isinstance(d, AbstractNormal):
        return "gaussian"
    if isinstance(d, Beta):
        return "beta"
    if isinstance(d, (Bernoulli, BernoulliLogits)):
        return "bernoulli"
    if isinstance(d, (GammaShapeRate, GammaShapeScale)):
        return "gamma"
    if isinstance(d, InverseGamma):
        return "inverse_gamma"
    if isinstance(d, Dirichlet):
        return "dirichlet"
    if isinstance(d, DirichletCollection):
        return "dirichlet_collection"
    if isinstance(d, Categorical):
        return "categorical"
    if isinstance(d, (Wishart, WishartInverseScale)):
        return "wishart"
    if isinstance(d, InverseWishart):
        return "inverse_wishart"
    if isinstance(d, Poisson):
        return "poisson"
    raise TypeError(f"No natural-parameter view for {type(d).__name__}")


def to_natural(d: Distribution):
    return tuple(jnp.asarray(n) for n in _TABLE[family_key(d)][0](d))


def from_natural(key: str, nat) -> Distribution:
    return _TABLE[key][1](nat)


def _wrap_gamma(d):
    if isinstance(d, GammaShapeScale):
        a, b = d.shape_rate()
        return GammaShapeRate(a, b)
    return d


# Event ranks of each family's natural-parameter leaves (used to distinguish the
# plate/batch axis from event axes when reducing or padding message batches).
NAT_EVENT_RANKS = {
    "gaussian": (0, 0),
    "mv_gaussian": (1, 2),
    "beta": (0, 0),
    "bernoulli": (0,),
    "gamma": (0, 0),
    "inverse_gamma": (0, 0),
    "dirichlet": (1,),
    "dirichlet_collection": (2,),
    "categorical": (1,),
    "wishart": (0, 2),
    "inverse_wishart": (0, 2),
    "poisson": (0,),
}


def prod_reduce(d: Distribution, size: int, axis: int = 0) -> Distribution:
    """Product of ``size`` plated messages along ``axis`` (natural-param sum).

    Message leaves that lack the plate axis (shared across copies — all inputs to
    that rule were unbatched) contribute ``size * leaf``.  This is the
    plate-aggregation primitive: N likelihood messages to a shared parameter
    collapse in one reduction (and across shards, one psum)."""
    key = family_key(d)
    nat = to_natural(d)
    ranks = NAT_EVENT_RANKS[key]
    out = []
    for n, r in zip(nat, ranks):
        if n.ndim == r:
            out.append(size * n)
        else:
            out.append(jnp.sum(n, axis=axis))
    return from_natural(key, tuple(out))


def broadcast_batch(d: Distribution, batch_shape: tuple) -> Distribution:
    """Broadcast every natural leaf to a full ``batch_shape`` batch (leaves keep
    their trailing event axes).  Used by nested-plate factors so that a message
    computed from partially-batched inputs stands explicitly for the whole
    grid of factor copies before masking/reduction."""
    key = family_key(d)
    nat = to_natural(d)
    ranks = NAT_EVENT_RANKS[key]
    out = []
    for n, r in zip(nat, ranks):
        evt = n.shape[n.ndim - r:] if r else ()
        out.append(jnp.broadcast_to(n, tuple(batch_shape) + evt))
    return from_natural(key, tuple(out))


def prod_reduce_axes(d: Distribution, axes) -> Distribution:
    """Product of plated messages over multiple leading batch axes at once
    (natural-parameter sum).  Leaves must already carry the full batch
    (see broadcast_batch)."""
    key = family_key(d)
    nat = to_natural(d)
    axes = tuple(axes)
    return from_natural(key, tuple(jnp.sum(n, axis=axes) for n in nat))


def log_partition(family: str, nat: tuple):
    """A(η) for unit-base-measure families (broadcasts over leading axes).

    Used by the log-scale machinery (engine/logscale.py) and by mixture
    message products: the evidence of a product of normalized densities is
    ``A(Ση) − ΣA(η_i)`` — one closed-form expression per family."""
    from jax.scipy.special import gammaln, logsumexp

    if family == "gaussian":
        xi, w = nat
        return 0.5 * xi * xi / w + 0.5 * jnp.log(2.0 * jnp.pi / w)
    if family == "mv_gaussian":
        xi, w = nat
        d = xi.shape[-1]
        sol = jnp.linalg.solve(w, xi[..., None])[..., 0]
        _, logdet = jnp.linalg.slogdet(w)
        return (0.5 * jnp.einsum("...i,...i->...", xi, sol)
                + 0.5 * (d * jnp.log(2.0 * jnp.pi) - logdet))
    if family == "beta":
        a, b = nat[0] + 1.0, nat[1] + 1.0
        return gammaln(a) + gammaln(b) - gammaln(a + b)
    if family == "gamma":
        return gammaln(nat[0] + 1.0) - (nat[0] + 1.0) * jnp.log(nat[1])
    if family == "dirichlet":
        alpha = nat[0] + 1.0
        return jnp.sum(gammaln(alpha), axis=-1) - gammaln(
            jnp.sum(alpha, axis=-1))
    if family == "bernoulli":
        return jax.nn.softplus(nat[0])
    if family == "categorical":
        return logsumexp(nat[0], axis=-1)
    raise NotImplementedError(
        f"log_partition for family {family!r} is not available."
    )


def _prod_mixture(mix, rest: list[Distribution]) -> Distribution:
    """Product of one MixtureDist message with same-family conjugate messages:
    distribute the natural-parameter sum over components and re-weight by the
    per-component evidences  log w'_k = log w_k + A(η_k + η_rest) − A(η_k)
    (the shared −A(η_rest) constant cancels under normalization).  This is
    what makes the mixture posterior's weights equal the switch posterior's
    responsibilities exactly (reference mixture_tests.jl:85-89)."""
    from .mixture import MixtureDist

    fam = family_key(mix.components[0])
    if not rest:
        return mix
    plain = prod_all(rest)
    if family_key(plain) != fam:
        from .base import ProductError

        raise ProductError(
            f"Mixture message with {fam!r} components meets a "
            f"{family_key(plain)!r} message on one variable."
        )
    eta_rest = to_natural(plain)
    lw0 = jax.nn.log_softmax(jnp.asarray(mix.log_weights), axis=-1)
    comps, lws = [], []
    for i, c in enumerate(mix.components):
        eta_k = to_natural(c)
        eta = tuple(a + b for a, b in zip(eta_k, eta_rest))
        comps.append(from_natural(fam, eta))
        lws.append(lw0[..., i] + log_partition(fam, eta)
                   - log_partition(fam, eta_k))
    lw = jax.nn.log_softmax(jnp.stack(lws, axis=-1), axis=-1)
    return MixtureDist(lw, tuple(comps))


def prod_all(dists: list[Distribution]) -> Distribution:
    """Product of a list of same-support messages via natural addition.

    Mixed families raise — the compile/runtime analogue of the reference's
    EnsureSupportedFunctionalForm error on unresolved non-conjugate products
    (src/constraints/form/form_ensure_supported.jl:15-54)."""
    from .mixture import MixtureDist
    from .pointmass import PointMass

    points = [d for d in dists if isinstance(d, PointMass)]
    if points:
        # a point-mass message collapses the product (reference: GenericProd
        # with PointMass / the ForcePointMass pattern,
        # test/models/statespace/collision_tests.jl:33-35)
        return points[0]
    mixtures = [d for d in dists if isinstance(d, MixtureDist)]
    if mixtures:
        if len(mixtures) > 1:
            from .base import ProductError

            raise ProductError(
                "Product of two mixture messages on one variable is not "
                "supported (K² component blow-up); restructure the model so "
                "at most one Mixture node feeds each variable."
            )
        return _prod_mixture(
            mixtures[0], [d for d in dists if not isinstance(d, MixtureDist)]
        )
    keys = [family_key(d) for d in dists]
    key = keys[0]
    if any(k != key for k in keys):
        from .base import ProductError

        raise ProductError(
            f"Non-conjugate message product: families {sorted(set(keys))} meet on "
            "one variable. Use a functional form constraint (PointMass/SampleList/"
            "projection) or refactor the model."
        )
    nats = [to_natural(_wrap_gamma(d) if key == "gamma" else d) for d in dists]
    total = nats[0]
    for n in nats[1:]:
        total = tuple(a + b for a, b in zip(total, n))
    return from_natural(key, total)


def coerce_message_family(d, family: str | None):
    """Convert between equivalent discrete carriers so family-generic nodes
    can meet either switch prior: a 2-class Categorical message becomes a
    Bernoulli (log-odds) when the target group is Bernoulli, and vice versa
    (the reference's Mixture accepts both — mixture_tests.jl uses a Bernoulli
    selector).  A no-op for matching or non-coercible families."""
    try:
        key = family_key(d)
    except TypeError:
        return d
    if family is None or key == family:
        return d
    if key == "categorical" and family == "bernoulli":
        logits = d.logits
        if logits.shape[-1] == 2:
            return BernoulliLogits(logits[..., 1] - logits[..., 0])
    if key == "bernoulli" and family == "categorical":
        logit = to_natural(d)[0]
        return Categorical(jnp.stack([jnp.zeros_like(logit), logit], axis=-1))
    return d


def nat_div(a: Distribution, b: Distribution) -> Distribution:
    """Divide distribution a by b (natural-parameter subtraction) — the cavity
    operation of EP-style message updates."""
    from .mixture import MixtureDist

    if isinstance(a, MixtureDist) and isinstance(b, MixtureDist):
        # Cavity of a mixture marginal w.r.t. the mixture message that formed
        # it: the marginal's components are exactly (message component η_k +
        # shared likelihood η), so component-wise subtraction recovers the
        # same plain likelihood cavity from every pair — component 0 suffices.
        fam = family_key(a.components[0])
        na = to_natural(a.components[0])
        nb = to_natural(b.components[0])
        return from_natural(fam, tuple(x - y for x, y in zip(na, nb)))
    if isinstance(a, MixtureDist) or isinstance(b, MixtureDist):
        raise TypeError(
            "Cavity division between a mixture and a plain distribution is "
            "undefined; initialize mixture-output variables with a plain "
            "(single-family) distribution so messages stay paired."
        )
    key = family_key(a)
    na, nb = to_natural(a), to_natural(b)
    return from_natural(key, tuple(x - y for x, y in zip(na, nb)))


def pad_plate(d: Distribution, lo: int, hi: int, total: int) -> Distribution:
    """Embed a message batch covering slots [lo, hi) into a length-``total`` batch,
    padding with the multiplicative identity (zero natural params).  Leaves lacking
    the plate axis are broadcast first."""
    key = family_key(d)
    nat = to_natural(d)
    ranks = NAT_EVENT_RANKS[key]
    out = []
    for n, r in zip(nat, ranks):
        if n.ndim == r:
            n = jnp.broadcast_to(n, (hi - lo,) + n.shape)
        if lo == 0 and hi == total:
            out.append(n)
        else:
            out.append(jnp.pad(n, [(lo, total - hi)] + [(0, 0)] * (n.ndim - 1)))
    return from_natural(key, tuple(out))
