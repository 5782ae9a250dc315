"""Non-conjugate projection: ProjectedTo form constraint + sample-based products.

Reference: ExponentialFamilyProjection via ProjectionExt
(ext/ProjectionExt/ProjectionExt.jl:24-67) — when a variable's incoming messages
have no closed-form product (non-conjugate model), the product density is
projected onto a chosen exponential family.  The reference runs stochastic
natural-gradient descent on the manifold; here the projection is
importance-weighted moment matching (one fused batched sampling + reduction —
the sample budget replaces the gradient-iteration budget, and everything stays
inside the compiled program):

    q*(x) ∝ Π_i m_i(x);  samples z_k ~ proposal;  w_k ∝ q*(z_k)/proposal(z_k);
    fit family to the weighted moments.

The proposal is the product of the Gaussian-family subset of messages (or the
single widest message) — self-normalized importance sampling with a heavy-ish
proposal.  ``CVIProjection``-style delta methods reuse the same primitive.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..dists import (
    Beta,
    GammaShapeRate,
    NormalMeanVariance,
)
from ..dists.gaussian import AbstractNormal
from ..graph.constraints import AbstractFormConstraint


def _fit_gaussian(samples, w):
    m = jnp.sum(w * samples)
    v = jnp.sum(w * (samples - m) ** 2)
    return NormalMeanVariance(m, jnp.clip(v, 1e-10))


def _fit_beta(samples, w):
    s = jnp.clip(samples, 1e-6, 1 - 1e-6)
    m = jnp.sum(w * s)
    v = jnp.clip(jnp.sum(w * (s - m) ** 2), 1e-10)
    # method of moments
    common = m * (1 - m) / v - 1.0
    return Beta(jnp.clip(m * common, 1e-3), jnp.clip((1 - m) * common, 1e-3))


def _fit_gamma(samples, w):
    s = jnp.clip(samples, 1e-10)
    m = jnp.sum(w * s)
    v = jnp.clip(jnp.sum(w * (s - m) ** 2), 1e-12)
    return GammaShapeRate(jnp.clip(m * m / v, 1e-3), jnp.clip(m / v, 1e-6))


_FITTERS = {
    "gaussian": _fit_gaussian,
    "beta": _fit_beta,
    "gamma": _fit_gamma,
}


class ProjectedTo(AbstractFormConstraint):
    """Project a (possibly non-conjugate) message product onto a family.

    ``ProjectedTo("beta")`` / ``ProjectedTo("gaussian")`` / ``ProjectedTo("gamma")``
    — reference ``ProjectedTo(Beta)`` etc.  Scalar support in round 1."""

    def __init__(self, family: str, n_samples: int = 2048, seed: int = 0,
                 proposal_scale: float = 2.0):
        if family not in _FITTERS:
            raise ValueError(f"ProjectedTo supports {sorted(_FITTERS)}")
        self.family = family
        self.n_samples = n_samples
        self.seed = seed
        self.proposal_scale = proposal_scale

    # engine hook: called with the raw message list instead of prod_all
    def project_product(self, msgs):
        key = jax.random.PRNGKey(self.seed)
        # proposal: moment-matched Gaussian over the messages' supports, widened
        props = [m for m in msgs if isinstance(m, AbstractNormal)]
        if props:
            m0 = sum(p.mean() for p in props) / len(props)
            v0 = sum(p.var() for p in props) / len(props)
        else:
            m0, v0 = jnp.asarray(0.5), jnp.asarray(1.0)
        proposal = NormalMeanVariance(m0, self.proposal_scale * v0)
        z0 = proposal.sample(key, (self.n_samples,))
        if self.family == "beta":
            # the Gaussian proposal already concentrates where the messages do;
            # clip into the open unit interval (clipped mass is negligible when
            # the proposal is informative, and IS reweighting corrects the rest)
            z = jnp.clip(z0, 1e-5, 1.0 - 1e-5)
            log_jac = jnp.zeros_like(z0)
        elif self.family == "gamma":
            z = jnp.exp(z0)
            log_jac = jnp.log(z)
        else:
            z = z0
            log_jac = jnp.zeros_like(z0)
        logw = sum(m.logpdf(z) for m in msgs) - proposal.logpdf(z0) + log_jac
        logw = logw - jnp.max(logw)
        w = jnp.exp(logw)
        w = w / jnp.sum(w)
        return _FITTERS[self.family](z, w)

    def constrain(self, dist):
        # already a closed-form marginal: project by moment matching directly
        return self.project_product([dist])
