"""Finite mixture distribution over same-family exponential components.

TPU-native equivalent of the reference's ``BayesBase.MixtureDistribution``
as produced by the generic ``Mixture(switch=...)`` node: the posterior of the
mixture output IS a mixture — the reference test asserts
``component(getdata(posteriors[:θ]), k)`` equals the standalone-model
posterior and ``posteriors[:selector].p ≈ θ.weights``
(/root/reference/test/models/mixtures/mixture_tests.jl:60-109).

The message product of a mixture with a same-family conjugate message
distributes over components (natural-parameter addition per component) and
re-weights by the per-component log-partitions — see ``prod_all`` in
dists/natural.py.  Because every component is the same family and K is a
static Python int, a MixtureDist is an ordinary JAX pytree: scan/vmap/jit
compatible with fixed structure.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from .base import Distribution, dist_dataclass


@dist_dataclass
class MixtureDist(Distribution):
    """Mixture with ``log_weights`` (K,) and a tuple of K same-family
    components.  ``log_weights`` are kept normalized (log-simplex)."""

    log_weights: Any
    components: Any  # tuple of K Distribution pytrees

    # --- structure ------------------------------------------------------------
    @property
    def k(self) -> int:
        return len(self.components)

    def component(self, k: int) -> Distribution:
        """k-th component (reference ``BayesBase.component(d, k)``, 0-based)."""
        return self.components[k]

    @property
    def weights(self):
        """Normalized mixing weights (reference ``d.weights``)."""
        return jax.nn.softmax(jnp.asarray(self.log_weights), axis=-1)

    # --- statistics -----------------------------------------------------------
    def _wsum(self, fn):
        w = self.weights
        total = None
        for i, c in enumerate(self.components):
            term = w[..., i] * fn(c)
            total = term if total is None else total + term
        return total

    def mean(self):
        return self._wsum(lambda c: c.mean())

    def var(self):
        m = self.mean()
        second = self._wsum(lambda c: c.var() + c.mean() ** 2)
        return second - m * m

    def mean_log(self):
        """E[log x] — exact: a mixture expectation is the weighted sum of
        component expectations for any integrand."""
        return self._wsum(lambda c: c.mean_log())

    def mean_mirrorlog(self):
        return self._wsum(lambda c: c.mean_mirrorlog())

    def entropy(self):
        raise NotImplementedError(
            "A finite mixture has no closed-form entropy; Bethe free energy "
            "is unsupported on generic-Mixture models (BP-only, reference "
            "parity) — use annotations=LogScaleAnnotations() for evidence / "
            "Bayes factors instead of free_energy=True."
        )

    def logpdf(self, x):
        lws = jax.nn.log_softmax(jnp.asarray(self.log_weights), axis=-1)
        terms = jnp.stack(
            [lws[..., i] + c.logpdf(x) for i, c in enumerate(self.components)],
            axis=-1,
        )
        return jax.scipy.special.logsumexp(terms, axis=-1)
