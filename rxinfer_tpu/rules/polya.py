"""Polya-Gamma augmented regression nodes: BinomialPolya, MultinomialPolya.

Reference: ReactiveMP BinomialPolya/MultinomialPolya nodes (Binomial/Multinomial
regression tests, SURVEY.md §2.2 node library).  Logistic likelihoods become
conditionally Gaussian in the coefficients via the Polya-Gamma identity; the
variational E-step uses the closed form  E[omega] = (n / 2c) tanh(c / 2)  with
c^2 = E[(x^T beta)^2], so the message to beta is an exact Gaussian:

    W = E[omega] x x^T ,   xi = (y - n/2) x.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..dists import MvNormalWeightedMeanPrecision, PointMass
from .expectations import e_cov, e_mean
from .registry import node


def _e_omega(n, c):
    """E[omega] for omega ~ PG(n, c); tanh form with the c→0 limit n/4."""
    small = jnp.abs(c) < 1e-4
    safe_c = jnp.where(small, 1.0, c)
    val = (n / (2.0 * safe_c)) * jnp.tanh(safe_c / 2.0)
    return jnp.where(small, n / 4.0, val)


def _xbeta_moments(q):
    x = q["x"].point if isinstance(q["x"], PointMass) else e_mean(q["x"])
    mb = e_mean(q["beta"])
    vb = e_cov(q["beta"])
    mean = jnp.einsum("...i,...i->...", x, mb)
    var = jnp.einsum("...i,...ij,...j->...", x, vb, x)
    return x, mean, var


@node("BinomialPolya")
class BinomialPolyaNode:
    """out ~ Binomial(n, logistic(x^T beta)); interfaces out, x, n, beta."""

    interfaces = ("out", "x", "n", "beta")
    needs_self_marginal = True  # reads q(beta) for the PG expectation

    @staticmethod
    def message_to_beta(q):
        y = e_mean(q["out"])
        n = q["n"].point if isinstance(q["n"], PointMass) else e_mean(q["n"])
        x, mean, var = _xbeta_moments(q)
        c = jnp.sqrt(jnp.clip(mean * mean + var, 1e-12))
        om = _e_omega(n, c)
        xi = (y - 0.5 * n)[..., None] * x
        w = om[..., None, None] * x[..., :, None] * x[..., None, :]
        return MvNormalWeightedMeanPrecision(xi, w)

    @staticmethod
    def average_energy(q):
        """E[-log p(y | x, beta)] under the PG variational bound."""
        from jax.scipy.special import gammaln

        y = e_mean(q["out"])
        n = q["n"].point if isinstance(q["n"], PointMass) else e_mean(q["n"])
        _, mean, var = _xbeta_moments(q)
        c = jnp.sqrt(jnp.clip(mean * mean + var, 1e-12))
        om = _e_omega(n, c)
        log_binom = gammaln(n + 1.0) - gammaln(y + 1.0) - gammaln(n - y + 1.0)
        # PG bound: log p >= log_binom + (y - n/2) m - om/2 E[(xb)^2] + n*log(sigmoid-ish const)
        bound = (
            log_binom
            + (y - 0.5 * n) * mean
            - 0.5 * om * (mean * mean + var)
            + 0.5 * om * c * c
            - n * jnp.log1p(jnp.exp(c))
            + 0.5 * n * c
        )
        return -bound


@node("MultinomialPolya")
class MultinomialPolyaNode:
    """out ~ Multinomial(n, softmax-stick-breaking(x^T B)); simplified two-class
    (binary split) variant routed through BinomialPolya semantics per class.

    Interfaces: out (K counts), x, n, beta (stacked (K-1)·d coefficients is not
    yet supported — this node currently handles K=2 and defers the general
    stick-breaking construction to a later round)."""

    interfaces = ("out", "x", "n", "beta")
    needs_self_marginal = True

    @staticmethod
    def message_to_beta(q):
        y = e_mean(q["out"])
        y1 = y[..., 0]
        n = q["n"].point if isinstance(q["n"], PointMass) else e_mean(q["n"])
        q2 = dict(q)
        q2["out"] = PointMass(y1)
        q2["n"] = PointMass(jnp.asarray(n))
        return BinomialPolyaNode.message_to_beta(q2)

    @staticmethod
    def average_energy(q):
        y = e_mean(q["out"])
        q2 = dict(q)
        q2["out"] = PointMass(y[..., 0])
        return BinomialPolyaNode.average_energy(q2)
