"""Discrete / simplex families: Categorical, Multinomial, Dirichlet,
DirichletCollection (tensor Dirichlet for transition matrices).

Reference: ExponentialFamily types; DirichletCollection is the prior over the columns
of a DiscreteTransition matrix in the HMM conformance test
(/root/reference/test/models/statespace/hmm_tests.jl:8-29).

TPU notes: categorical messages are carried in *log space* (logits) wherever products
occur — products of categorical messages are logit additions (VPU adds), normalized
once via logsumexp at marginal extraction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma, gammaln, xlogy
from jax.nn import log_softmax, softmax

from .base import Distribution, dist_dataclass, register_prod


@dist_dataclass
class Categorical(Distribution):
    """Categorical over K classes, stored as logits (..., K).

    ``p`` (probabilities) is derived; storing logits makes the message product exact
    and overflow-free."""

    logits: jnp.ndarray

    @property
    def event_ndim(self) -> int:
        return 1

    @classmethod
    def from_probs(cls, p):
        return cls(jnp.log(jnp.clip(p, 1e-37)))

    def probs(self):
        return softmax(self.logits, axis=-1)

    def log_probs(self):
        return log_softmax(self.logits, axis=-1)

    def mean(self):
        return self.probs()

    def var(self):
        p = self.probs()
        return p * (1.0 - p)

    def mode(self):
        k = self.logits.shape[-1]
        return jax.nn.one_hot(jnp.argmax(self.logits, axis=-1), k, dtype=self.logits.dtype)

    def entropy(self):
        lp = self.log_probs()
        return -jnp.sum(jnp.exp(lp) * lp, axis=-1)

    def logpdf(self, x):
        # x is one-hot (float) or an int index
        lp = self.log_probs()
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.integer):
            return jnp.take_along_axis(lp, jnp.asarray(x)[..., None], axis=-1)[..., 0]
        return jnp.sum(x * lp, axis=-1)

    def sample(self, key, shape=()):
        idx = jax.random.categorical(key, self.logits, shape=tuple(shape) + self.logits.shape[:-1])
        return jax.nn.one_hot(idx, self.logits.shape[-1], dtype=jnp.float32)

    def batch_shape(self):
        return jnp.shape(self.logits)[:-1]

    @classmethod
    def vague(cls, k: int, dtype=jnp.float32):
        return cls(jnp.zeros((k,), dtype))


@register_prod(Categorical, Categorical)
def _prod_categorical(x: Categorical, y: Categorical) -> Categorical:
    return Categorical(x.logits + y.logits)


@dist_dataclass
class Dirichlet(Distribution):
    """Dirichlet(alpha) over the (K-1)-simplex; alpha shape (..., K)."""

    alpha: jnp.ndarray

    @property
    def event_ndim(self) -> int:
        return 1

    def mean(self):
        a0 = jnp.sum(self.alpha, axis=-1, keepdims=True)
        return self.alpha / a0

    def var(self):
        a = self.alpha
        a0 = jnp.sum(a, axis=-1, keepdims=True)
        m = a / a0
        return m * (1.0 - m) / (a0 + 1.0)

    def mean_log(self):
        """E[log p_k] = digamma(alpha_k) - digamma(alpha_0)."""
        return digamma(self.alpha) - digamma(jnp.sum(self.alpha, axis=-1, keepdims=True))

    def entropy(self):
        a = self.alpha
        a0 = jnp.sum(a, axis=-1)
        k = a.shape[-1]
        lb = jnp.sum(gammaln(a), axis=-1) - gammaln(a0)
        return (
            lb
            + (a0 - k) * digamma(a0)
            - jnp.sum((a - 1.0) * digamma(a), axis=-1)
        )

    def logpdf(self, x):
        a = self.alpha
        a0 = jnp.sum(a, axis=-1)
        lb = jnp.sum(gammaln(a), axis=-1) - gammaln(a0)
        return jnp.sum(xlogy(a - 1.0, x), axis=-1) - lb

    def sample(self, key, shape=()):
        return jax.random.dirichlet(key, self.alpha, shape=tuple(shape) + self.alpha.shape[:-1])

    def batch_shape(self):
        return jnp.shape(self.alpha)[:-1]

    @classmethod
    def vague(cls, k: int, dtype=jnp.float32):
        return cls(jnp.ones((k,), dtype))


@register_prod(Dirichlet, Dirichlet)
def _prod_dirichlet(x: Dirichlet, y: Dirichlet) -> Dirichlet:
    return Dirichlet(x.alpha + y.alpha - 1.0)


@dist_dataclass
class DirichletCollection(Distribution):
    """Independent Dirichlets over the *first* axis of a tensor of concentration
    parameters — the prior over a (K_out, K_in, ...) transition tensor where each
    slice alpha[:, j, ...] is a Dirichlet over K_out outcomes.

    Matches the reference's DirichletCollection semantics (HMM transition prior,
    /root/reference/test/models/statespace/hmm_tests.jl:10): columns sum to one.
    """

    alpha: jnp.ndarray  # (K_out, K_in, ...) — simplex over axis 0

    @property
    def event_ndim(self) -> int:
        return self.alpha.ndim

    def mean(self):
        a0 = jnp.sum(self.alpha, axis=0, keepdims=True)
        return self.alpha / a0

    def mean_log(self):
        return digamma(self.alpha) - digamma(jnp.sum(self.alpha, axis=0, keepdims=True))

    def var(self):
        a = self.alpha
        a0 = jnp.sum(a, axis=0, keepdims=True)
        m = a / a0
        return m * (1.0 - m) / (a0 + 1.0)

    def entropy(self):
        a = self.alpha
        a0 = jnp.sum(a, axis=0)
        k = a.shape[0]
        lb = jnp.sum(gammaln(a), axis=0) - gammaln(a0)
        per_col = lb + (a0 - k) * digamma(a0) - jnp.sum((a - 1.0) * digamma(a), axis=0)
        return jnp.sum(per_col)

    def logpdf(self, x):
        a = self.alpha
        a0 = jnp.sum(a, axis=0)
        lb = jnp.sum(gammaln(a), axis=0) - gammaln(a0)
        return jnp.sum(xlogy(a - 1.0, x) - lb)

    def batch_shape(self):
        return ()

    @classmethod
    def vague(cls, shape, dtype=jnp.float32):
        return cls(jnp.ones(shape, dtype))


@register_prod(DirichletCollection, DirichletCollection)
def _prod_dirichlet_collection(x: DirichletCollection, y: DirichletCollection):
    return DirichletCollection(x.alpha + y.alpha - 1.0)


@dist_dataclass
class Multinomial(Distribution):
    """Multinomial(n, p) with p shape (..., K)."""

    n: jnp.ndarray
    logits: jnp.ndarray

    @property
    def event_ndim(self) -> int:
        return 1

    def probs(self):
        return softmax(self.logits, axis=-1)

    def mean(self):
        return self.n[..., None] * self.probs() if jnp.ndim(self.n) else self.n * self.probs()

    def var(self):
        p = self.probs()
        n = self.n[..., None] if jnp.ndim(self.n) else self.n
        return n * p * (1.0 - p)

    def logpdf(self, x):
        lp = log_softmax(self.logits, axis=-1)
        return (
            gammaln(jnp.sum(x, axis=-1) + 1.0)
            - jnp.sum(gammaln(x + 1.0), axis=-1)
            + jnp.sum(x * lp, axis=-1)
        )

    def batch_shape(self):
        return jnp.shape(self.logits)[:-1]

    @classmethod
    def vague(cls, k: int, n=1.0, dtype=jnp.float32):
        return cls(jnp.asarray(n, dtype), jnp.zeros((k,), dtype))
