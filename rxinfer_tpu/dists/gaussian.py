"""Gaussian family — scalar and multivariate, all reference parametrizations.

Reference parametrizations (ExponentialFamily, re-exported at src/RxInfer.jl:5-6;
aliases resolved in src/model/graphppl.jl:340-423):
  NormalMeanVariance, NormalMeanPrecision, NormalWeightedMeanPrecision,
  MvNormalMeanCovariance, MvNormalMeanPrecision, MvNormalWeightedMeanPrecision,
  MvNormalMeanScalePrecision.

TPU-native design notes:
  * The *compute* form for message products is weighted-mean/precision (natural form):
    products are elementwise adds (``xi1+xi2``, ``W1+W2``) → pure VPU work, batchable,
    and ``psum``-able across shards for shared-parameter nodes.
  * Conversions precision↔covariance go through Cholesky (fp32); all matrices are
    re-symmetrized after solves to keep positive-definiteness under bf16/fp32 mixes
    (reference leans on FastCholesky for the same corner cases,
    docs/src/manuals/model-specification.md:284-287).
  * Everything is shape-polymorphic over leading batch dims so whole plates of
    messages are one fused kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import (
    Distribution,
    HUGE,
    TINY,
    dist_dataclass,
    register_prod,
)

_LOG2PI = 1.8378770664093453  # log(2*pi)


# ---------------------------------------------------------------------------------
# Linear-algebra helpers (batched, Cholesky-based)
# ---------------------------------------------------------------------------------

def _symmetrize(m):
    return 0.5 * (m + jnp.swapaxes(m, -1, -2))


def cholesky(m):
    """Batched Cholesky with symmetrization (FastCholesky-equivalent entry point)."""
    return jnp.linalg.cholesky(_symmetrize(m))


def chol_solve(chol, b):
    """Solve A x = b given chol(A); b may be a vector (..., d) or matrix (..., d, k)."""
    vec = b.ndim == chol.ndim - 1
    if vec:
        b = b[..., None]
    y = jax.scipy.linalg.solve_triangular(chol, b, lower=True)
    x = jax.scipy.linalg.solve_triangular(jnp.swapaxes(chol, -1, -2), y, lower=False)
    return x[..., 0] if vec else x


def pd_inverse(m):
    """Positive-definite inverse, symmetrized.

    d <= 16 uses closed-form cofactor/Schur inverses (ops/smallmat.py):
    batched Cholesky/LU on tiny matrices lowers to sequential per-matrix
    loops on TPU (measured ~35 ms for 10k 4x4 solves vs <1 ms closed-form;
    round-5 widened the gate from 8 — the 8|rest Schur split is exact to
    float tolerance at d=16).  Larger d keeps the Cholesky path."""
    if m.shape[-1] <= 16:
        from ..ops.smallmat import small_inv

        return _symmetrize(small_inv(m))
    c = cholesky(m)
    eye = jnp.broadcast_to(jnp.eye(m.shape[-1], dtype=m.dtype), m.shape)
    return _symmetrize(chol_solve(c, eye))


def pd_logdet(m):
    if m.shape[-1] <= 16:
        from ..ops.smallmat import small_logdet

        return small_logdet(m)
    c = cholesky(m)
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(c, axis1=-2, axis2=-1)), axis=-1)


def pd_inverse_and_logdet(m):
    if m.shape[-1] <= 16:
        from ..ops.smallmat import small_inv, small_logdet

        return _symmetrize(small_inv(m)), small_logdet(m)
    c = cholesky(m)
    eye = jnp.broadcast_to(jnp.eye(m.shape[-1], dtype=m.dtype), m.shape)
    inv = _symmetrize(chol_solve(c, eye))
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(c, axis1=-2, axis2=-1)), axis=-1)
    return inv, logdet


# =================================================================================
# Scalar Gaussians
# =================================================================================

class AbstractNormal(Distribution):
    """Common scalar-Gaussian statistics, implemented over (mean, var) accessors."""

    def mode(self):
        return self.mean()

    def entropy(self):
        return 0.5 * (_LOG2PI + 1.0) + 0.5 * jnp.log(self.var())

    def logpdf(self, x):
        m, v = self.mean(), self.var()
        return -0.5 * (_LOG2PI + jnp.log(v) + (x - m) ** 2 / v)

    def precision(self):
        return 1.0 / self.var()

    def weightedmean(self):
        return self.mean() / self.var()

    def sample(self, key, shape=()):
        m, v = self.mean(), self.var()
        shp = tuple(shape) + jnp.broadcast_shapes(jnp.shape(m), jnp.shape(v))
        return m + jnp.sqrt(v) * jax.random.normal(key, shp, dtype=jnp.result_type(m, v))

    def batch_shape(self):
        return jnp.shape(self.mean())


@dist_dataclass
class NormalMeanVariance(AbstractNormal):
    """N(mean, variance) — reference NormalMeanVariance."""

    mu: jnp.ndarray
    v: jnp.ndarray

    def mean(self):
        return self.mu

    def var(self):
        return self.v

    @classmethod
    def vague(cls, dtype=jnp.float32):
        return cls(jnp.asarray(0.0, dtype), jnp.asarray(HUGE, dtype))


@dist_dataclass
class NormalMeanPrecision(AbstractNormal):
    """N(mean, 1/precision) — reference NormalMeanPrecision."""

    mu: jnp.ndarray
    w: jnp.ndarray

    def mean(self):
        return self.mu

    def var(self):
        return 1.0 / self.w

    def precision(self):
        return self.w

    def weightedmean(self):
        return self.mu * self.w

    @classmethod
    def vague(cls, dtype=jnp.float32):
        return cls(jnp.asarray(0.0, dtype), jnp.asarray(TINY, dtype))


@dist_dataclass
class NormalWeightedMeanPrecision(AbstractNormal):
    """Natural (information) form: xi = W*mu, w = precision.

    The compute form for message products: prod = (xi1+xi2, w1+w2).
    Reference: NormalWeightedMeanPrecision (ExponentialFamily)."""

    xi: jnp.ndarray
    w: jnp.ndarray

    def mean(self):
        # the zero natural vector is the (vague) multiplicative identity:
        # its mean is 0 by convention, not 0/0 — a dangling unobserved
        # descendant's cavity is exactly (0, 0) and a NaN here poisons the
        # downstream 0·NaN natural conversion (round-5).  Improper negative
        # precisions pass through untouched.
        w_safe = jnp.where(self.w == 0.0, TINY, self.w)
        return self.xi / w_safe

    def var(self):
        return 1.0 / self.w

    def precision(self):
        return self.w

    def weightedmean(self):
        return self.xi

    @classmethod
    def vague(cls, dtype=jnp.float32):
        return cls(jnp.asarray(0.0, dtype), jnp.asarray(TINY, dtype))


ScalarGaussians = (NormalMeanVariance, NormalMeanPrecision, NormalWeightedMeanPrecision)


def as_weighted_mean_precision(d) -> NormalWeightedMeanPrecision:
    if isinstance(d, NormalWeightedMeanPrecision):
        return d
    return NormalWeightedMeanPrecision(d.weightedmean(), d.precision())


def _scalar_gaussian_prod(a, b):
    fa, fb = as_weighted_mean_precision(a), as_weighted_mean_precision(b)
    return NormalWeightedMeanPrecision(fa.xi + fb.xi, fa.w + fb.w)


for _t1 in ScalarGaussians:
    for _t2 in ScalarGaussians:
        register_prod(_t1, _t2, symmetric=False)(_scalar_gaussian_prod)


# =================================================================================
# Multivariate Gaussians
# =================================================================================

class AbstractMvNormal(Distribution):
    @property
    def event_ndim(self) -> int:
        return 1

    @property
    def dim(self) -> int:
        return self.mean().shape[-1]

    def mode(self):
        return self.mean()

    def entropy(self):
        d = self.dim
        return 0.5 * d * (_LOG2PI + 1.0) + 0.5 * pd_logdet(self.cov())

    def logpdf(self, x):
        m, c = self.mean(), self.cov()
        d = m.shape[-1]
        diff = x - m
        if d <= 8:
            from ..ops.smallmat import small_logdet, small_solve

            maha = jnp.sum(diff * small_solve(_symmetrize(c), diff, matrix=False), axis=-1)
            logdet = small_logdet(c)
        else:
            cl = cholesky(c)
            y = jax.scipy.linalg.solve_triangular(
                cl, diff[..., None], lower=True
            )[..., 0]
            maha = jnp.sum(y * y, axis=-1)
            logdet = 2.0 * jnp.sum(
                jnp.log(jnp.diagonal(cl, axis1=-2, axis2=-1)), axis=-1
            )
        return -0.5 * (d * _LOG2PI + logdet + maha)

    def precision(self):
        return pd_inverse(self.cov())

    def weightedmean(self):
        # xi = Sigma^{-1} mu computed as a solve (no explicit inverse);
        # closed-form for d<=8 (batched tiny Cholesky is a TPU trap)
        c = self.cov()
        if c.shape[-1] <= 16:
            from ..ops.smallmat import small_solve

            return small_solve(_symmetrize(c), self.mean(), matrix=False)
        return chol_solve(cholesky(c), self.mean())

    def sample(self, key, shape=()):
        m, c = self.mean(), self.cov()
        cl = cholesky(c)
        shp = tuple(shape) + m.shape
        z = jax.random.normal(key, shp, dtype=m.dtype)
        return m + jnp.einsum("...ij,...j->...i", cl, z)

    def batch_shape(self):
        return jnp.shape(self.mean())[:-1]


@dist_dataclass
class MvNormalMeanCovariance(AbstractMvNormal):
    """N(mean, Sigma) — reference MvNormalMeanCovariance."""

    mu: jnp.ndarray
    sigma: jnp.ndarray

    def mean(self):
        return self.mu

    def cov(self):
        return self.sigma

    def var(self):
        return jnp.diagonal(self.sigma, axis1=-2, axis2=-1)

    @classmethod
    def vague(cls, dim: int, dtype=jnp.float32):
        return cls(jnp.zeros((dim,), dtype), HUGE * jnp.eye(dim, dtype=dtype))


@dist_dataclass
class MvNormalMeanPrecision(AbstractMvNormal):
    """N(mean, W^{-1}) — reference MvNormalMeanPrecision."""

    mu: jnp.ndarray
    w: jnp.ndarray

    def mean(self):
        return self.mu

    def cov(self):
        return pd_inverse(self.w)

    def var(self):
        return jnp.diagonal(self.cov(), axis1=-2, axis2=-1)

    def precision(self):
        return self.w

    def weightedmean(self):
        return jnp.einsum("...ij,...j->...i", self.w, self.mu)

    def entropy(self):
        d = self.dim
        return 0.5 * d * (_LOG2PI + 1.0) - 0.5 * pd_logdet(self.w)

    @classmethod
    def vague(cls, dim: int, dtype=jnp.float32):
        return cls(jnp.zeros((dim,), dtype), TINY * jnp.eye(dim, dtype=dtype))


@dist_dataclass
class MvNormalWeightedMeanPrecision(AbstractMvNormal):
    """Natural (information) form: xi = W mu.  The message-product compute form.

    Reference MvNormalWeightedMeanPrecision; the product of N Gaussian messages on a
    variable is sum(xi_i), sum(W_i) — one batched add, or a ``psum`` across shards."""

    xi: jnp.ndarray
    w: jnp.ndarray

    def mean(self):
        # exactly-zero precision (the vague identity carrier — e.g. the
        # cavity of a dangling unobserved descendant) has mean 0 by
        # convention; an unguarded solve would NaN it (round-5)
        d = self.w.shape[-1]
        allzero = jnp.all(self.w == 0.0, axis=(-2, -1), keepdims=True)
        w_safe = jnp.where(
            allzero, jnp.eye(d, dtype=self.w.dtype) / HUGE, self.w)
        if d <= 16:
            # closed-form solve: batched Cholesky on tiny matrices lowers to
            # sequential per-matrix loops on TPU (~35 ms for 10k 4x4 — the
            # round-5 streaming-engine tick was 100x slow on exactly this)
            from ..ops.smallmat import small_solve

            return small_solve(w_safe, self.xi, matrix=False)
        return chol_solve(cholesky(w_safe), self.xi)

    def cov(self):
        return pd_inverse(self.w)

    def var(self):
        return jnp.diagonal(self.cov(), axis1=-2, axis2=-1)

    def precision(self):
        return self.w

    def weightedmean(self):
        return self.xi

    def mean_cov(self):
        cov = pd_inverse(self.w)
        return jnp.einsum("...ij,...j->...i", cov, self.xi), cov

    def entropy(self):
        d = self.dim
        return 0.5 * d * (_LOG2PI + 1.0) - 0.5 * pd_logdet(self.w)

    @property
    def dim(self) -> int:
        return self.xi.shape[-1]

    def batch_shape(self):
        return jnp.shape(self.xi)[:-1]

    @classmethod
    def vague(cls, dim: int, dtype=jnp.float32):
        return cls(jnp.zeros((dim,), dtype), TINY * jnp.eye(dim, dtype=dtype))


@dist_dataclass
class MvNormalMeanScalePrecision(AbstractMvNormal):
    """N(mean, (gamma I)^{-1}) — reference MvNormalMeanScalePrecision."""

    mu: jnp.ndarray
    gamma: jnp.ndarray

    def mean(self):
        return self.mu

    def cov(self):
        d = self.mu.shape[-1]
        return jnp.eye(d, dtype=self.mu.dtype) / self.gamma[..., None, None] \
            if jnp.ndim(self.gamma) > 0 else jnp.eye(d, dtype=self.mu.dtype) / self.gamma

    def var(self):
        d = self.mu.shape[-1]
        return jnp.broadcast_to(1.0 / jnp.asarray(self.gamma)[..., None], self.mu.shape)

    def precision(self):
        d = self.mu.shape[-1]
        g = jnp.asarray(self.gamma)
        return jnp.eye(d, dtype=self.mu.dtype) * g[..., None, None] \
            if g.ndim > 0 else jnp.eye(d, dtype=self.mu.dtype) * g

    def weightedmean(self):
        return self.mu * jnp.asarray(self.gamma)[..., None] \
            if jnp.ndim(self.gamma) > 0 else self.mu * self.gamma

    def entropy(self):
        d = self.dim
        return 0.5 * d * (_LOG2PI + 1.0) - 0.5 * d * jnp.log(jnp.asarray(self.gamma))

    @classmethod
    def vague(cls, dim: int, dtype=jnp.float32):
        return cls(jnp.zeros((dim,), dtype), jnp.asarray(TINY, dtype))


MvGaussians = (
    MvNormalMeanCovariance,
    MvNormalMeanPrecision,
    MvNormalWeightedMeanPrecision,
    MvNormalMeanScalePrecision,
)


def as_mv_weighted_mean_precision(d) -> MvNormalWeightedMeanPrecision:
    if isinstance(d, MvNormalWeightedMeanPrecision):
        return d
    return MvNormalWeightedMeanPrecision(d.weightedmean(), d.precision())


def _mv_gaussian_prod(a, b):
    fa, fb = as_mv_weighted_mean_precision(a), as_mv_weighted_mean_precision(b)
    return MvNormalWeightedMeanPrecision(fa.xi + fb.xi, fa.w + fb.w)


for _t1 in MvGaussians:
    for _t2 in MvGaussians:
        register_prod(_t1, _t2, symmetric=False)(_mv_gaussian_prod)


# ---------------------------------------------------------------------------------
# Joint Gaussian over a factor's local cluster (structured VMP / smoothing pairs)
# ---------------------------------------------------------------------------------

@dist_dataclass
class JointGaussian(AbstractMvNormal):
    """Joint Gaussian q(x_a, x_b) over two adjacent interfaces, stored as one block.

    Needed for structured (non-mean-field) constraints: e.g. the pairwise smoothing
    marginal q(x_t, x_{t-1}) of an LGSSM / the q(x, z) cluster of GCV.  Reference
    equivalent: local cluster marginals from ``getlocalclusters``
    (src/model/plugins/reactivemp_force_marginal_computation_plugin.jl:100-125)."""

    mu: jnp.ndarray     # (..., da+db)
    sigma: jnp.ndarray  # (..., da+db, da+db)
    # dims of the first block, as a static-free array (kept as int array scalar)
    da: jnp.ndarray

    def mean(self):
        return self.mu

    def cov(self):
        return self.sigma

    def marginals(self, da: int):
        """Split into the two block marginals (da is a Python int at trace time)."""
        a = MvNormalMeanCovariance(self.mu[..., :da], self.sigma[..., :da, :da])
        b = MvNormalMeanCovariance(self.mu[..., da:], self.sigma[..., da:, da:])
        return a, b
