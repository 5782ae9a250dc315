"""Matrix-variate families: Wishart, InverseWishart.

Reference: ExponentialFamily Wishart/InverseWishart, used as precision/covariance
priors in the multivariate IID conformance tests (test/models/iid/mv_iid_*.jl).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import digamma, gammaln

from .base import Distribution, TINY, dist_dataclass, register_prod
from .gaussian import pd_inverse, pd_logdet

_LOG2 = 0.6931471805599453
_LOGPI = 1.1447298858494002


def _mv_gammaln(d: int, a):
    """Multivariate log-gamma  log Γ_d(a)."""
    j = jnp.arange(1, d + 1, dtype=a.dtype if hasattr(a, "dtype") else jnp.float32)
    return 0.25 * d * (d - 1) * _LOGPI + jnp.sum(gammaln(a[..., None] + 0.5 * (1.0 - j)), axis=-1)


def _mv_digamma(d: int, a):
    j = jnp.arange(1, d + 1, dtype=a.dtype if hasattr(a, "dtype") else jnp.float32)
    return jnp.sum(digamma(a[..., None] + 0.5 * (1.0 - j)), axis=-1)


@dist_dataclass
class Wishart(Distribution):
    """Wishart(nu, S) with scale matrix S; E[X] = nu * S."""

    nu: jnp.ndarray
    s: jnp.ndarray  # (..., d, d)

    @property
    def event_ndim(self) -> int:
        return 2

    @property
    def dim(self) -> int:
        return self.s.shape[-1]

    def mean(self):
        return self.nu[..., None, None] * self.s if jnp.ndim(self.nu) else self.nu * self.s

    def mean_logdet(self):
        """E[log|X|] = psi_d(nu/2) + d log 2 + log|S|."""
        d = self.dim
        return _mv_digamma(d, 0.5 * self.nu) + d * _LOG2 + pd_logdet(self.s)

    def entropy(self):
        d = self.dim
        nu = self.nu
        logdet_s = pd_logdet(self.s)
        return (
            0.5 * (d + 1.0) * logdet_s
            + 0.5 * d * (d + 1.0) * _LOG2
            + _mv_gammaln(d, 0.5 * nu)
            - 0.5 * (nu - d - 1.0) * _mv_digamma(d, 0.5 * nu)
            + 0.5 * nu * d
        )

    def logpdf(self, x):
        d = self.dim
        nu = self.nu
        s_inv = pd_inverse(self.s)
        return (
            0.5 * (nu - d - 1.0) * pd_logdet(x)
            - 0.5 * jnp.einsum("...ij,...ji->...", s_inv, x)
            - 0.5 * nu * d * _LOG2
            - 0.5 * nu * pd_logdet(self.s)
            - _mv_gammaln(d, 0.5 * nu)
        )

    def batch_shape(self):
        return jnp.shape(self.s)[:-2]

    @classmethod
    def vague(cls, dim: int, dtype=jnp.float32):
        return cls(jnp.asarray(float(dim), dtype), (1.0 / TINY / dim) * jnp.eye(dim, dtype=dtype))


@register_prod(Wishart, Wishart)
def _prod_wishart(x: Wishart, y: Wishart) -> Wishart:
    d = x.dim
    v_inv = pd_inverse(x.s) + pd_inverse(y.s)
    return Wishart(x.nu + y.nu - d - 1.0, pd_inverse(v_inv))


@dist_dataclass
class WishartInverseScale(Distribution):
    """Wishart message carrier parameterized by the *inverse* scale (natural
    form): density ∝ |X|^{(nu-d-1)/2} exp(-1/2 tr(s_inv X)).

    Used for likelihood messages to precision variables whose per-copy scatter
    C_i is low-rank/singular (e.g. a single observation's outer product): the
    natural parameters (nu-d-1, C_i) sum across the plate WITHOUT any inversion,
    and only the full-rank posterior is ever converted back to a proper Wishart.
    """

    nu: jnp.ndarray
    s_inv: jnp.ndarray

    @property
    def event_ndim(self) -> int:
        return 2

    @property
    def dim(self) -> int:
        return self.s_inv.shape[-1]

    def mean(self):
        s = pd_inverse(self.s_inv)
        return (self.nu[..., None, None] if jnp.ndim(self.nu) else self.nu) * s

    def to_wishart(self) -> Wishart:
        return Wishart(self.nu, pd_inverse(self.s_inv))

    def batch_shape(self):
        return jnp.shape(self.s_inv)[:-2]


@dist_dataclass
class InverseWishart(Distribution):
    """InverseWishart(nu, Psi); E[X] = Psi / (nu - d - 1)."""

    nu: jnp.ndarray
    psi: jnp.ndarray

    @property
    def event_ndim(self) -> int:
        return 2

    @property
    def dim(self) -> int:
        return self.psi.shape[-1]

    def mean(self):
        d = self.dim
        denom = self.nu - d - 1.0
        return self.psi / (denom[..., None, None] if jnp.ndim(denom) else denom)

    def mean_inverse(self):
        """E[X^{-1}] = nu * Psi^{-1}."""
        inv = pd_inverse(self.psi)
        return (self.nu[..., None, None] if jnp.ndim(self.nu) else self.nu) * inv

    def mean_logdet(self):
        """E[log|X|] = log|Psi| - d log 2 - psi_d(nu/2)."""
        d = self.dim
        return pd_logdet(self.psi) - d * _LOG2 - _mv_digamma(d, 0.5 * self.nu)

    def entropy(self):
        d = self.dim
        nu = self.nu
        return (
            0.5 * (d + 1.0) * pd_logdet(self.psi)
            + 0.5 * d * (d + 1.0) * _LOG2
            + _mv_gammaln(d, 0.5 * nu)
            - 0.5 * (nu + d + 1.0) * _mv_digamma(d, 0.5 * nu)
            + 0.5 * nu * d
        )

    def logpdf(self, x):
        d = self.dim
        nu = self.nu
        x_inv = pd_inverse(x)
        return (
            -0.5 * (nu + d + 1.0) * pd_logdet(x)
            - 0.5 * jnp.einsum("...ij,...ji->...", self.psi, x_inv)
            + 0.5 * nu * pd_logdet(self.psi)
            - 0.5 * nu * d * _LOG2
            - _mv_gammaln(d, 0.5 * nu)
        )

    def batch_shape(self):
        return jnp.shape(self.psi)[:-2]

    @classmethod
    def vague(cls, dim: int, dtype=jnp.float32):
        return cls(jnp.asarray(dim + 2.0 + TINY, dtype), TINY * jnp.eye(dim, dtype=dtype))


@register_prod(InverseWishart, InverseWishart)
def _prod_inverse_wishart(x: InverseWishart, y: InverseWishart) -> InverseWishart:
    d = x.dim
    return InverseWishart(x.nu + y.nu + d + 1.0, x.psi + y.psi)
