"""Node library: VMP/BP message rules + average energies for the conjugate
exponential-family node set (SURVEY.md §2.2 "Node library").

Rule convention: ``q`` maps interface name → marginal Distribution (PointMass for
observed slots / constants).  All rules are batched — leading dims broadcast — so a
whole plate of messages is one fused XLA op.  Average energies return E_q[-log f]
per factor copy; an optional ``q['joint']`` carries a structured pairwise marginal
(JointGaussian for Gaussian chains, pairwise-probability matrix for discrete
chains), matching the reference's structured-cluster energies
(src/model/plugins/reactivemp_free_energy.jl:57-63).

Reference rule tables: ReactiveMP @rule definitions, reconstructed from
docs/src/manuals/inference/create-node.md and the test-suite model coverage.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import betaln, digamma, gammaln, xlogy

from ..dists import (
    Bernoulli,
    Beta,
    Categorical,
    Dirichlet,
    DirichletCollection,
    GammaShapeRate,
    InverseWishart,
    MvNormalMeanCovariance,
    MvNormalMeanPrecision,
    MvNormalWeightedMeanPrecision,
    NormalMeanPrecision,
    NormalMeanVariance,
    NormalWeightedMeanPrecision,
    PointMass,
    Poisson,
    Wishart,
    WishartInverseScale,
    pd_inverse,
    pd_logdet,
)
from .expectations import (
    e_cov,
    e_inverse,
    e_log,
    e_log_precision,
    e_logdet,
    e_mean,
    e_mirrorlog,
    e_outer,
    e_precision,
    e_sq,
    e_var,
)
from .registry import node

_LOG2PI = 1.8378770664093453
_LOG2PIE = 2.837877066409345  # log(2*pi*e)


# =================================================================================
# Scalar Gaussian nodes
# =================================================================================

@node("NormalMeanVariance")
class NormalMeanVarianceNode:
    interfaces = ("out", "mean", "var")
    # BP cluster: out & mean exchange messages (reference default structured
    # factorization q(out, mean); the noise stays across the mean-field split)
    cavity_cluster = ("out", "mean")

    @staticmethod
    def message_to_out(q):
        # BP/VMP agree when mean is informed by its marginal and var is known.
        return NormalMeanVariance(e_mean(q["mean"]), e_mean(q["var"]) + e_var(q["mean"]))

    @staticmethod
    def message_to_mean(q):
        return NormalMeanVariance(e_mean(q["out"]), e_mean(q["var"]) + e_var(q["out"]))

    @staticmethod
    def vmp_message_to_out(q):
        # mean-field (q_mean) variant: no neighbor-variance propagation
        return NormalMeanVariance(e_mean(q["mean"]), e_mean(q["var"]))

    @staticmethod
    def vmp_message_to_mean(q):
        return NormalMeanVariance(e_mean(q["out"]), e_mean(q["var"]))

    @staticmethod
    def message_to_var(q):
        """Conjugate InverseGamma message: ∝ v^{-1/2} exp(-C/(2v)) — the
        improper a=-1/2 carrier; prior product adds (1/2, C/2)."""
        from ..dists import InverseGamma as IG

        c = e_sq(q["out"]) - 2.0 * e_mean(q["out"]) * e_mean(q["mean"]) + e_sq(q["mean"])
        return IG(jnp.full_like(c, -0.5), 0.5 * c)

    @staticmethod
    def average_energy(q):
        var_d = q["var"]
        if isinstance(var_d, PointMass):
            e_inv_v = 1.0 / var_d.point
            e_log_v = jnp.log(var_d.point)
        else:
            e_inv_v = var_d.mean_inverse()
            e_log_v = var_d.mean_log()
        c = e_sq(q["out"]) - 2.0 * e_mean(q["out"]) * e_mean(q["mean"]) + e_sq(q["mean"])
        return 0.5 * (_LOG2PI + e_log_v + c * e_inv_v)


@node("NormalMeanPrecision")
class NormalMeanPrecisionNode:
    interfaces = ("out", "mean", "prec")
    cavity_cluster = ("out", "mean")

    @staticmethod
    def message_to_out(q):
        # Structured-cluster (BP) form: the mean's own uncertainty propagates
        # (reference rule (m_mean, q_prec) → N(mean(m_μ), var(m_μ) + 1/E[w]));
        # collapses to the VMP form when the mean is observed/constant.
        return NormalMeanVariance(
            e_mean(q["mean"]), 1.0 / e_precision(q["prec"]) + e_var(q["mean"])
        )

    @staticmethod
    def message_to_mean(q):
        return NormalMeanVariance(
            e_mean(q["out"]), 1.0 / e_precision(q["prec"]) + e_var(q["out"])
        )

    @staticmethod
    def vmp_message_to_out(q):
        return NormalMeanPrecision(e_mean(q["mean"]), e_precision(q["prec"]))

    @staticmethod
    def vmp_message_to_mean(q):
        return NormalMeanPrecision(e_mean(q["out"]), e_precision(q["prec"]))

    @staticmethod
    def message_to_prec(q):
        c = e_sq(q["out"]) - 2.0 * e_mean(q["out"]) * e_mean(q["mean"]) + e_sq(q["mean"])
        return GammaShapeRate(jnp.full_like(c, 1.5), 0.5 * c)

    @staticmethod
    def average_energy(q):
        w = e_precision(q["prec"])
        elogw = e_log_precision(q["prec"])
        c = e_sq(q["out"]) - 2.0 * e_mean(q["out"]) * e_mean(q["mean"]) + e_sq(q["mean"])
        return 0.5 * (_LOG2PI - elogw + w * c)


# =================================================================================
# Multivariate Gaussian nodes
# =================================================================================

def _mv_centered_second_moment(q):
    """E[(x - mu)(x - mu)^T] under independent q(x), q(mu)."""
    mx, mm = e_mean(q["out"]), e_mean(q["mean"])
    diff = mx - mm
    return e_cov(q["out"]) + e_cov(q["mean"]) + diff[..., None] * diff[..., None, :]


@node("MvNormalMeanCovariance")
class MvNormalMeanCovarianceNode:
    interfaces = ("out", "mean", "cov")
    cavity_cluster = ("out", "mean")

    @staticmethod
    def message_to_out(q):
        return MvNormalMeanCovariance(e_mean(q["mean"]), e_mean(q["cov"]) + e_cov(q["mean"]))

    @staticmethod
    def message_to_mean(q):
        return MvNormalMeanCovariance(e_mean(q["out"]), e_mean(q["cov"]) + e_cov(q["out"]))

    @staticmethod
    def vmp_message_to_out(q):
        return MvNormalMeanCovariance(e_mean(q["mean"]), e_mean(q["cov"]))

    @staticmethod
    def vmp_message_to_mean(q):
        return MvNormalMeanCovariance(e_mean(q["out"]), e_mean(q["cov"]))

    @staticmethod
    def message_to_cov(q):
        # Conjugate to InverseWishart: msg ∝ |V|^{-1/2} exp(-1/2 tr(V^{-1} C)).
        # As an IW(nu, Psi) carrier this is the improper nu = -d member: the
        # product rule (nu1+nu2+d+1) then adds exactly one pseudo-observation to
        # the prior (IW(nu0,Psi0) × msg = IW(nu0+1, Psi0+C)).
        c = _mv_centered_second_moment(q)
        d = c.shape[-1]
        return InverseWishart(jnp.full(c.shape[:-2], -float(d)), c)

    @staticmethod
    def average_energy(q):
        cov_d = q["cov"]
        if isinstance(cov_d, PointMass):
            v_inv = pd_inverse(cov_d.point)
            logdet = pd_logdet(cov_d.point)
        else:
            v_inv = cov_d.mean_inverse()
            logdet = cov_d.mean_logdet()
        c = _mv_centered_second_moment(q)
        d = c.shape[-1]
        return 0.5 * (d * _LOG2PI + logdet + jnp.einsum("...ij,...ji->...", v_inv, c))


@node("MvNormalMeanPrecision")
class MvNormalMeanPrecisionNode:
    interfaces = ("out", "mean", "prec")
    cavity_cluster = ("out", "mean")

    @staticmethod
    def message_to_out(q):
        # Structured-cluster (BP) form: neighbor covariance propagates
        # (collapses to the VMP form for observed/constant means).
        return MvNormalMeanCovariance(
            e_mean(q["mean"]),
            pd_inverse(e_precision(q["prec"])) + e_cov(q["mean"]),
        )

    @staticmethod
    def message_to_mean(q):
        return MvNormalMeanCovariance(
            e_mean(q["out"]),
            pd_inverse(e_precision(q["prec"])) + e_cov(q["out"]),
        )

    @staticmethod
    def vmp_message_to_out(q):
        return MvNormalMeanPrecision(e_mean(q["mean"]), e_precision(q["prec"]))

    @staticmethod
    def vmp_message_to_mean(q):
        return MvNormalMeanPrecision(e_mean(q["out"]), e_precision(q["prec"]))

    @staticmethod
    def message_to_prec(q):
        # Conjugate Wishart message: ∝ |W|^{1/2} exp(-1/2 tr(W C)).  Carried in
        # inverse-scale (natural) form — C can be singular per copy.
        c = _mv_centered_second_moment(q)
        d = c.shape[-1]
        nu = jnp.full(c.shape[:-2], float(d) + 2.0)
        return WishartInverseScale(nu, c)

    @staticmethod
    def average_energy(q):
        w = e_precision(q["prec"])
        elogdet = e_logdet(q["prec"])
        c = _mv_centered_second_moment(q)
        d = c.shape[-1]
        return 0.5 * (d * _LOG2PI - elogdet + jnp.einsum("...ij,...ji->...", w, c))


# ---------------------------------------------------------------------------------
# Linear-Gaussian nodes: out = A @ in + b + noise.  The LGSSM workhorse
# (contracted deterministic linear map, reference
# docs/src/manuals/model-specification.md:332-447).
# Interfaces: out, in, A (const), b (const), cov|prec (const or random).
# ---------------------------------------------------------------------------------

def _lg_noise_cov(q):
    if "cov" in q:
        noise = q["cov"]
        if isinstance(noise, PointMass):
            return noise.point
        return noise.mean()
    noise = q["prec"]
    return pd_inverse(e_precision(noise)) if jnp.ndim(e_precision(noise)) >= 2 else 1.0 / e_precision(noise)


def _lg_noise_prec(q):
    if "prec" in q:
        return e_precision(q["prec"])
    v = q["cov"]
    v = v.point if isinstance(v, PointMass) else v.mean()
    return pd_inverse(v) if jnp.ndim(v) >= 2 else 1.0 / v


class _MvLinearGaussianBase:
    interfaces = ("out", "in", "A", "b", "cov")

    @staticmethod
    def message_to_out(q):
        """BP forward message: N(A m + b, A V A^T + Sigma)."""
        a = q["A"].point
        b = q["b"].point
        m, v = e_mean(q["in"]), e_cov(q["in"])
        mean = jnp.einsum("...ij,...j->...i", a, m) + b
        cov = jnp.einsum("...ij,...jk,...lk->...il", a, v, a) + _lg_noise_cov(q)
        return MvNormalMeanCovariance(mean, cov)

    @staticmethod
    def message_to_in(q):
        """BP backward message in information form:
        W = A^T (Sigma + V_out)^{-1} A,  xi = A^T (Sigma + V_out)^{-1} (m_out - b)."""
        a = q["A"].point
        b = q["b"].point
        m_out, v_out = e_mean(q["out"]), e_cov(q["out"])
        s = _lg_noise_cov(q) + v_out
        s_inv = pd_inverse(s)
        at_sinv = jnp.einsum("...ji,...jk->...ik", a, s_inv)
        w = jnp.einsum("...ik,...kj->...ij", at_sinv, a)
        xi = jnp.einsum("...ik,...k->...i", at_sinv, m_out - b)
        return MvNormalWeightedMeanPrecision(xi, w)

    @staticmethod
    def _centered_second_moment(q):
        """E[(out - A in - b)(...)^T]; uses q['joint'] cross-cov when present."""
        a = q["A"].point
        b = q["b"].point
        m_out, m_in = e_mean(q["out"]), e_mean(q["in"])
        v_out, v_in = e_cov(q["out"]), e_cov(q["in"])
        diff = m_out - jnp.einsum("...ij,...j->...i", a, m_in) - b
        c = (
            v_out
            + jnp.einsum("...ij,...jk,...lk->...il", a, v_in, a)
            + diff[..., None] * diff[..., None, :]
        )
        joint = q.get("joint")
        if joint is not None:
            # joint: cross covariance Cov(out, in) of shape (..., d_out, d_in)
            cross = jnp.einsum("...ij,...kj->...ik", joint, a)
            c = c - cross - jnp.swapaxes(cross, -1, -2)
        return c

    @classmethod
    def average_energy(cls, q):
        c = cls._centered_second_moment(q)
        d = c.shape[-1]
        w = _lg_noise_prec(q)
        if "prec" in q and not isinstance(q["prec"], PointMass):
            elogdet = e_logdet(q["prec"])
        else:
            elogdet = -pd_logdet(_lg_noise_cov(q))
        return 0.5 * (d * _LOG2PI - elogdet + jnp.einsum("...ij,...ji->...", w, c))


@node("MvLinearGaussianCovariance")
class MvLinearGaussianCovarianceNode(_MvLinearGaussianBase):
    pass


@node("MvLinearGaussianPrecision")
class MvLinearGaussianPrecisionNode(_MvLinearGaussianBase):
    interfaces = ("out", "in", "A", "b", "prec")

    @staticmethod
    def message_to_prec(q):
        c = _MvLinearGaussianBase._centered_second_moment(q)
        d = c.shape[-1]
        return WishartInverseScale(jnp.full(c.shape[:-2], float(d) + 2.0), c)


class _LinearGaussianScalarBase:
    """Scalar out = a*in + b + noise."""

    interfaces = ("out", "in", "A", "b", "var")

    @staticmethod
    def _noise_var(q):
        if "var" in q:
            return e_mean(q["var"])
        return 1.0 / e_precision(q["prec"])

    @classmethod
    def message_to_out(cls, q):
        a, b = q["A"].point, q["b"].point
        return NormalMeanVariance(
            a * e_mean(q["in"]) + b, a * a * e_var(q["in"]) + cls._noise_var(q)
        )

    @classmethod
    def message_to_in(cls, q):
        a, b = q["A"].point, q["b"].point
        s = cls._noise_var(q) + e_var(q["out"])
        w = a * a / s
        xi = a * (e_mean(q["out"]) - b) / s
        return NormalWeightedMeanPrecision(xi, w)

    @classmethod
    def _c2(cls, q):
        a, b = q["A"].point, q["b"].point
        diff = e_mean(q["out"]) - a * e_mean(q["in"]) - b
        c = e_var(q["out"]) + a * a * e_var(q["in"]) + diff * diff
        joint = q.get("joint")
        if joint is not None:  # scalar cross covariance Cov(out, in)
            c = c - 2.0 * a * joint
        return c

    @classmethod
    def average_energy(cls, q):
        if "prec" in q and not isinstance(q["prec"], PointMass):
            elogw = e_log_precision(q["prec"])
            w = e_precision(q["prec"])
        else:
            v = cls._noise_var(q)
            elogw = -jnp.log(v)
            w = 1.0 / v
        return 0.5 * (_LOG2PI - elogw + w * cls._c2(q))


@node("LinearGaussianCovariance")
class LinearGaussianCovarianceNode(_LinearGaussianScalarBase):
    pass


@node("LinearGaussianPrecision")
class LinearGaussianPrecisionNode(_LinearGaussianScalarBase):
    interfaces = ("out", "in", "A", "b", "prec")

    @classmethod
    def message_to_prec(cls, q):
        c2 = cls._c2(q)
        return GammaShapeRate(jnp.full_like(c2, 1.5), 0.5 * c2)


# =================================================================================
# Beta / Bernoulli / Binomial
# =================================================================================

@node("Beta")
class BetaNode:
    interfaces = ("out", "a", "b")

    @staticmethod
    def message_to_out(q):
        return Beta(e_mean(q["a"]), e_mean(q["b"]))

    @staticmethod
    def average_energy(q):
        a, b = e_mean(q["a"]), e_mean(q["b"])
        return (
            betaln(a, b)
            - (a - 1.0) * e_log(q["out"])
            - (b - 1.0) * e_mirrorlog(q["out"])
        )


@node("Bernoulli")
class BernoulliNode:
    interfaces = ("out", "p")

    @staticmethod
    def message_to_out(q):
        logit = e_log(q["p"]) - e_mirrorlog(q["p"])
        return Bernoulli(jnp.clip(1.0 / (1.0 + jnp.exp(-logit)), 1e-12, 1 - 1e-12))

    @staticmethod
    def message_to_p(q):
        y = e_mean(q["out"])
        return Beta(1.0 + y, 2.0 - y)

    @staticmethod
    def average_energy(q):
        y = e_mean(q["out"])
        return -(y * e_log(q["p"]) + (1.0 - y) * e_mirrorlog(q["p"]))


@node("Binomial")
class BinomialNode:
    interfaces = ("out", "n", "p")

    @staticmethod
    def message_to_p(q):
        y, n = e_mean(q["out"]), e_mean(q["n"])
        return Beta(1.0 + y, 1.0 + n - y)

    @staticmethod
    def average_energy(q):
        y, n = e_mean(q["out"]), e_mean(q["n"])
        return -(
            gammaln(n + 1.0)
            - gammaln(y + 1.0)
            - gammaln(n - y + 1.0)
            + y * e_log(q["p"])
            + (n - y) * e_mirrorlog(q["p"])
        )


# =================================================================================
# Gamma / InverseGamma
# =================================================================================

@node("GammaShapeRate")
class GammaShapeRateNode:
    interfaces = ("out", "shape", "rate")

    @staticmethod
    def message_to_out(q):
        return GammaShapeRate(e_mean(q["shape"]), e_precision(q["rate"]))

    @staticmethod
    def message_to_rate(q):
        return GammaShapeRate(e_mean(q["shape"]) + 1.0, e_mean(q["out"]))

    @staticmethod
    def average_energy(q):
        a = e_mean(q["shape"])
        return -(
            (a - 1.0) * e_log(q["out"])
            - e_mean(q["rate"]) * e_mean(q["out"])
            + a * e_log(q["rate"])
            - gammaln(a)
        )


@node("GammaShapeScale")
class GammaShapeScaleNode:
    interfaces = ("out", "shape", "scale")

    @staticmethod
    def message_to_out(q):
        from ..dists import GammaShapeScale as GSS

        return GSS(e_mean(q["shape"]), e_mean(q["scale"]))

    @staticmethod
    def average_energy(q):
        a = e_mean(q["shape"])
        th = e_mean(q["scale"])
        return -(
            (a - 1.0) * e_log(q["out"])
            - e_mean(q["out"]) / th
            - a * jnp.log(th)
            - gammaln(a)
        )


@node("InverseGamma")
class InverseGammaNode:
    interfaces = ("out", "shape", "scale")

    @staticmethod
    def message_to_out(q):
        from ..dists import InverseGamma as IG

        return IG(e_mean(q["shape"]), e_mean(q["scale"]))

    @staticmethod
    def average_energy(q):
        a, b = e_mean(q["shape"]), e_mean(q["scale"])
        d = q["out"]
        e_log_x = jnp.log(d.point) if isinstance(d, PointMass) else d.mean_log()
        e_inv_x = 1.0 / d.point if isinstance(d, PointMass) else d.mean_inverse()
        return -(a * jnp.log(b) - gammaln(a) - (a + 1.0) * e_log_x - b * e_inv_x)


# =================================================================================
# Categorical / Dirichlet / transitions
# =================================================================================

def _e_onehot(d):
    """E[one-hot(out)] for Categorical-valued variables (or observed one-hot)."""
    if isinstance(d, PointMass):
        return d.point
    return d.mean()


def _e_log_simplex(d):
    """E[log p] for simplex-valued variables (Dirichlet or PointMass)."""
    if isinstance(d, PointMass):
        return jnp.log(jnp.clip(d.point, 1e-37))
    return d.mean_log()


@node("Categorical")
class CategoricalNode:
    interfaces = ("out", "p")

    @staticmethod
    def message_to_out(q):
        return Categorical(_e_log_simplex(q["p"]))

    @staticmethod
    def message_to_p(q):
        return Dirichlet(1.0 + _e_onehot(q["out"]))

    @staticmethod
    def average_energy(q):
        return -jnp.sum(_e_onehot(q["out"]) * _e_log_simplex(q["p"]), axis=-1)


@node("Dirichlet")
class DirichletNode:
    interfaces = ("out", "alpha")

    @staticmethod
    def message_to_out(q):
        return Dirichlet(e_mean(q["alpha"]))

    @staticmethod
    def average_energy(q):
        a = e_mean(q["alpha"])
        lb = jnp.sum(gammaln(a), axis=-1) - gammaln(jnp.sum(a, axis=-1))
        return lb - jnp.sum((a - 1.0) * _e_log_simplex(q["out"]), axis=-1)


@node("DirichletCollection")
class DirichletCollectionNode:
    interfaces = ("out", "alpha")

    @staticmethod
    def message_to_out(q):
        return DirichletCollection(e_mean(q["alpha"]))

    @staticmethod
    def average_energy(q):
        a = e_mean(q["alpha"])
        d_out = q["out"]
        elogp = (
            jnp.log(jnp.clip(d_out.point, 1e-37))
            if isinstance(d_out, PointMass)
            else d_out.mean_log()
        )
        lb = jnp.sum(gammaln(a), axis=0) - gammaln(jnp.sum(a, axis=0))
        return jnp.sum(lb) + jnp.sum(-(a - 1.0) * elogp)


@node("DiscreteTransition")
class DiscreteTransitionNode:
    """out ~ Categorical(P[:, in]): interfaces out, in, matrix.

    Reference: DiscreteTransition (HMM; test/models/statespace/hmm_tests.jl)."""

    interfaces = ("out", "in", "matrix")

    @staticmethod
    def _elogp(q):
        m = q["matrix"]
        if isinstance(m, PointMass):
            return jnp.log(jnp.clip(m.point, 1e-37))
        return m.mean_log()

    @classmethod
    def message_to_out(cls, q):
        return Categorical(
            jnp.einsum("...ij,...j->...i", cls._elogp(q), _e_onehot(q["in"]))
        )

    @classmethod
    def message_to_in(cls, q):
        return Categorical(
            jnp.einsum("...ij,...i->...j", cls._elogp(q), _e_onehot(q["out"]))
        )

    @classmethod
    def message_to_out_structured(cls, q):
        """Structured/BP prediction message: the out marginal of the joint
        q(out, in) ∝ exp(E[log A][out, in]) q̃(in), i.e.
        log p(out) = logsumexp_in(E[log A] + log q(in)) — exact marginalization
        instead of the geometric-mean VMP message.  Selected for data wrapped
        in ``UnfactorizedData`` (reference: `infer` with UnfactorizedData,
        test/inference/inference_tests.jl:1652-1723, where the prediction's
        entropy must match q(s)'s under an identity likelihood)."""
        from jax.scipy.special import logsumexp

        logq_in = jnp.log(jnp.clip(_e_onehot(q["in"]), 1e-37))
        return Categorical(
            logsumexp(cls._elogp(q) + logq_in[..., None, :], axis=-1)
        )

    @classmethod
    def message_to_matrix(cls, q):
        joint = q.get("joint")
        if joint is None:
            joint = _e_onehot(q["out"])[..., :, None] * _e_onehot(q["in"])[..., None, :]
        return DirichletCollection(1.0 + joint)

    @classmethod
    def average_energy(cls, q):
        joint = q.get("joint")
        if joint is None:
            joint = _e_onehot(q["out"])[..., :, None] * _e_onehot(q["in"])[..., None, :]
        return -jnp.sum(joint * cls._elogp(q), axis=(-2, -1))


# =================================================================================
# Wishart / InverseWishart priors
# =================================================================================

@node("Wishart")
class WishartNode:
    interfaces = ("out", "nu", "S")

    @staticmethod
    def message_to_out(q):
        return Wishart(e_mean(q["nu"]), q["S"].point if isinstance(q["S"], PointMass) else e_mean(q["S"]))

    @staticmethod
    def average_energy(q):
        from ..dists.matrix import _mv_gammaln

        nu = e_mean(q["nu"])
        s = q["S"].point if isinstance(q["S"], PointMass) else e_mean(q["S"])
        d = s.shape[-1]
        s_inv = pd_inverse(s)
        e_x = e_precision(q["out"])
        return -(
            0.5 * (nu - d - 1.0) * e_logdet(q["out"])
            - 0.5 * jnp.einsum("...ij,...ji->...", s_inv, e_x)
            - 0.5 * nu * d * jnp.log(2.0)
            - 0.5 * nu * pd_logdet(s)
            - _mv_gammaln(d, 0.5 * nu)
        )


@node("InverseWishart")
class InverseWishartNode:
    interfaces = ("out", "nu", "Psi")

    @staticmethod
    def message_to_out(q):
        return InverseWishart(
            e_mean(q["nu"]), q["Psi"].point if isinstance(q["Psi"], PointMass) else e_mean(q["Psi"])
        )

    @staticmethod
    def average_energy(q):
        from ..dists.matrix import _mv_gammaln

        nu = e_mean(q["nu"])
        psi = q["Psi"].point if isinstance(q["Psi"], PointMass) else e_mean(q["Psi"])
        d = psi.shape[-1]
        return -(
            -0.5 * (nu + d + 1.0) * e_logdet(q["out"])
            - 0.5 * jnp.einsum("...ij,...ji->...", psi, e_inverse(q["out"]))
            + 0.5 * nu * pd_logdet(psi)
            - 0.5 * nu * d * jnp.log(2.0)
            - _mv_gammaln(d, 0.5 * nu)
        )


# =================================================================================
# Poisson
# =================================================================================

@node("Poisson")
class PoissonNode:
    interfaces = ("out", "rate")

    @staticmethod
    def message_to_out(q):
        return Poisson(jnp.exp(e_log(q["rate"])))

    @staticmethod
    def message_to_rate(q):
        return GammaShapeRate(1.0 + e_mean(q["out"]), jnp.ones_like(e_mean(q["out"])))

    @staticmethod
    def average_energy(q):
        y = e_mean(q["out"])
        lgy = gammaln(y + 1.0)  # exact for observed counts
        return e_mean(q["rate"]) - y * e_log(q["rate"]) + lgy


# =================================================================================
# Uniform (improper/flat contributions)
# =================================================================================

@node("Uniform")
class UniformNode:
    interfaces = ("out", "lo", "hi")

    @staticmethod
    def message_to_out(q):
        from ..dists import Uniform as U

        return U(e_mean(q["lo"]), e_mean(q["hi"]))

    @staticmethod
    def average_energy(q):
        return jnp.log(e_mean(q["hi"]) - e_mean(q["lo"]))


# =================================================================================
# Mixtures
# =================================================================================

@node("NormalMixture")
class NormalMixtureNode:
    """out ~ prod_k N(out; mean_k, prec_k^{-1})^{s_k}.

    Interfaces: out, switch, mean0..meanK-1, prec0..precK-1.
    Reference: NormalMixture node (GMM conformance tests)."""

    @staticmethod
    def _k(q):
        return sum(1 for key in q if key.startswith("mean"))

    @classmethod
    def _resp(cls, q):
        return _e_onehot(q["switch"])  # (..., K)

    @classmethod
    def message_to_out(cls, q):
        k = cls._k(q)
        r = cls._resp(q)
        w = sum(r[..., i] * e_precision(q[f"prec{i}"]) for i in range(k))
        xi = sum(
            r[..., i] * e_precision(q[f"prec{i}"]) * e_mean(q[f"mean{i}"])
            for i in range(k)
        )
        return NormalWeightedMeanPrecision(xi, w)

    @classmethod
    def message_to_switch(cls, q):
        k = cls._k(q)
        logits = []
        for i in range(k):
            w = e_precision(q[f"prec{i}"])
            elogw = e_log_precision(q[f"prec{i}"])
            c = (
                e_sq(q["out"])
                - 2.0 * e_mean(q["out"]) * e_mean(q[f"mean{i}"])
                + e_sq(q[f"mean{i}"])
            )
            logits.append(-0.5 * (_LOG2PI - elogw + w * c))
        return Categorical(jnp.stack(logits, axis=-1))

    @classmethod
    def _message_to_mean_i(cls, q, i):
        r = cls._resp(q)[..., i]
        w = e_precision(q[f"prec{i}"])
        return NormalWeightedMeanPrecision(r * w * e_mean(q["out"]), r * w)

    @classmethod
    def _message_to_prec_i(cls, q, i):
        r = cls._resp(q)[..., i]
        c = (
            e_sq(q["out"])
            - 2.0 * e_mean(q["out"]) * e_mean(q[f"mean{i}"])
            + e_sq(q[f"mean{i}"])
        )
        return GammaShapeRate(1.0 + 0.5 * r, 0.5 * r * c)

    @classmethod
    def average_energy(cls, q):
        k = cls._k(q)
        r = cls._resp(q)
        total = 0.0
        for i in range(k):
            w = e_precision(q[f"prec{i}"])
            elogw = e_log_precision(q[f"prec{i}"])
            c = (
                e_sq(q["out"])
                - 2.0 * e_mean(q["out"]) * e_mean(q[f"mean{i}"])
                + e_sq(q[f"mean{i}"])
            )
            total = total + r[..., i] * 0.5 * (_LOG2PI - elogw + w * c)
        return total


# dynamic interface rules for NormalMixture: message_to_mean3 etc.
def _normal_mixture_getattr(name):
    if name.startswith("message_to_mean"):
        i = int(name[len("message_to_mean"):])
        return lambda q: NormalMixtureNode._message_to_mean_i(q, i)
    if name.startswith("message_to_prec"):
        i = int(name[len("message_to_prec"):])
        return lambda q: NormalMixtureNode._message_to_prec_i(q, i)
    raise AttributeError(name)


class _NormalMixtureMeta(type):
    def __getattr__(cls, name):
        return _normal_mixture_getattr(name)


# Rebuild NormalMixtureNode with the metaclass providing per-component rules.
NormalMixtureNode = _NormalMixtureMeta(
    "NormalMixtureNode", (NormalMixtureNode,), {}
)
from .registry import _NODES  # noqa: E402

_NODES["NormalMixture"] = NormalMixtureNode


@node("MvNormalMixture")
class MvNormalMixtureNode:
    """Multivariate mixture likelihood: out ~ prod_k N(out; m_k, W_k^{-1})^{s_k}
    with MvNormal component means and Wishart component precisions.

    Reference: NormalMixture with multivariate components
    (test/models/mixtures/gmm_multivariate_tests.jl)."""

    _LOG2PI = 1.8378770664093453

    @staticmethod
    def _k(q):
        return sum(1 for key in q if key.startswith("mean"))

    @classmethod
    def _resp(cls, q):
        return _e_onehot(q["switch"])  # (..., K)

    @staticmethod
    def _second_moment(d):
        from .expectations import e_cov

        m = e_mean(d)
        return e_cov(d) + m[..., :, None] * m[..., None, :], m

    @classmethod
    def _c_i(cls, q, i):
        """E[(out − m_i)(out − m_i)^T] under independent q(out) q(m_i)."""
        xx, mx = cls._second_moment(q["out"])
        mm, mi = cls._second_moment(q[f"mean{i}"])
        cross = mx[..., :, None] * mi[..., None, :]
        return xx - cross - jnp.swapaxes(cross, -1, -2) + mm

    @classmethod
    def message_to_out(cls, q):
        from ..dists import MvNormalWeightedMeanPrecision
        from .expectations import e_precision

        k = cls._k(q)
        r = cls._resp(q)
        w = sum(
            r[..., i, None, None] * e_precision(q[f"prec{i}"]) for i in range(k)
        )
        xi = sum(
            r[..., i, None]
            * jnp.einsum(
                "...ij,...j->...i",
                e_precision(q[f"prec{i}"]), e_mean(q[f"mean{i}"]),
            )
            for i in range(k)
        )
        return MvNormalWeightedMeanPrecision(xi, w)

    @classmethod
    def message_to_switch(cls, q):
        from .expectations import e_logdet, e_precision

        k = cls._k(q)
        d = e_mean(q["out"]).shape[-1]
        logits = []
        for i in range(k):
            w = e_precision(q[f"prec{i}"])
            elogdet = e_logdet(q[f"prec{i}"])
            tr = jnp.einsum("...ij,...ji->...", w, cls._c_i(q, i))
            logits.append(-0.5 * (d * cls._LOG2PI - elogdet + tr))
        return Categorical(jnp.stack(logits, axis=-1))

    @classmethod
    def _message_to_mean_i(cls, q, i):
        from ..dists import MvNormalWeightedMeanPrecision
        from .expectations import e_precision

        r = cls._resp(q)[..., i]
        w = e_precision(q[f"prec{i}"])
        xi = jnp.einsum("...ij,...j->...i", w, e_mean(q["out"]))
        return MvNormalWeightedMeanPrecision(
            r[..., None] * xi, r[..., None, None] * w
        )

    @classmethod
    def _message_to_prec_i(cls, q, i):
        """Wishart message: |W|^{r/2} exp(−r/2 tr(C_i W)) — carried as an
        (improper for r<1) inverse-scale Wishart, aggregated in natural form."""
        from ..dists.matrix import WishartInverseScale

        r = cls._resp(q)[..., i]
        c = cls._c_i(q, i)
        d = c.shape[-1]
        return WishartInverseScale(r + d + 1.0, r[..., None, None] * c)

    @classmethod
    def average_energy(cls, q):
        from .expectations import e_logdet, e_precision

        k = cls._k(q)
        r = cls._resp(q)
        d = e_mean(q["out"]).shape[-1]
        total = 0.0
        for i in range(k):
            w = e_precision(q[f"prec{i}"])
            elogdet = e_logdet(q[f"prec{i}"])
            tr = jnp.einsum("...ij,...ji->...", w, cls._c_i(q, i))
            total = total + r[..., i] * 0.5 * (d * cls._LOG2PI - elogdet + tr)
        return total


def _mv_mixture_getattr(name):
    if name.startswith("message_to_mean"):
        i = int(name[len("message_to_mean"):])
        return lambda q: MvNormalMixtureNode._message_to_mean_i(q, i)
    if name.startswith("message_to_prec"):
        i = int(name[len("message_to_prec"):])
        return lambda q: MvNormalMixtureNode._message_to_prec_i(q, i)
    raise AttributeError(name)


class _MvNormalMixtureMeta(type):
    def __getattr__(cls, name):
        return _mv_mixture_getattr(name)


MvNormalMixtureNode = _MvNormalMixtureMeta(
    "MvNormalMixtureNode", (MvNormalMixtureNode,), {}
)
_NODES["MvNormalMixture"] = MvNormalMixtureNode


# =================================================================================
# GaussianDot: scalar out = a^T x + b + noise, vector random x, known vector a
# (reference: dot() + Normal contraction / SoftDot with known weights; the
# linear-regression workhorse, test/models/regression)
# =================================================================================

class _GaussianDotBase:
    interfaces = ("out", "in", "A", "b", "var")
    # out and in form one BP cluster (rules are message-form already)
    cavity_cluster = ("out", "in")

    @staticmethod
    def _a(q):
        return q["A"].point

    @classmethod
    def _noise_var(cls, q):
        if "var" in q:
            return e_mean(q["var"])
        return 1.0 / e_precision(q["prec"])

    @classmethod
    def message_to_out(cls, q):
        a = cls._a(q)
        b = q["b"].point
        m, v = e_mean(q["in"]), e_cov(q["in"])
        mean = jnp.einsum("...i,...i->...", a, m) + b
        var = jnp.einsum("...i,...ij,...j->...", a, v, a) + cls._noise_var(q)
        return NormalMeanVariance(mean, var)

    @classmethod
    def message_to_in(cls, q):
        a = cls._a(q)
        b = q["b"].point
        s = cls._noise_var(q) + e_var(q["out"])
        diff = e_mean(q["out"]) - b
        xi = a * (diff / s)[..., None]
        w = a[..., :, None] * a[..., None, :] / s[..., None, None]
        return MvNormalWeightedMeanPrecision(xi, w)

    @classmethod
    def _c2(cls, q):
        a = cls._a(q)
        b = q["b"].point
        m, v = e_mean(q["in"]), e_cov(q["in"])
        diff = e_mean(q["out"]) - jnp.einsum("...i,...i->...", a, m) - b
        return (
            e_var(q["out"])
            + jnp.einsum("...i,...ij,...j->...", a, v, a)
            + diff * diff
        )

    @classmethod
    def average_energy(cls, q):
        if "prec" in q and not isinstance(q["prec"], PointMass):
            elogw = e_log_precision(q["prec"])
            w = e_precision(q["prec"])
        else:
            nv = cls._noise_var(q)
            elogw = -jnp.log(nv)
            w = 1.0 / nv
        return 0.5 * (_LOG2PI - elogw + w * cls._c2(q))


@node("GaussianDotCovariance")
class GaussianDotCovarianceNode(_GaussianDotBase):
    pass


@node("GaussianDotPrecision")
class GaussianDotPrecisionNode(_GaussianDotBase):
    interfaces = ("out", "in", "A", "b", "prec")

    @classmethod
    def message_to_prec(cls, q):
        c2 = cls._c2(q)
        return GammaShapeRate(jnp.full_like(c2, 1.5), 0.5 * c2)


@node("MvNormalMeanScalePrecision")
class MvNormalMeanScalePrecisionNode:
    """out ~ N(mean, (gamma I)^{-1}) (reference MvNormalMeanScalePrecision)."""

    interfaces = ("out", "mean", "gamma")

    @staticmethod
    def message_to_out(q):
        from ..dists import MvNormalMeanScalePrecision as MSP

        return MSP(e_mean(q["mean"]), e_precision(q["gamma"]))

    @staticmethod
    def message_to_mean(q):
        from ..dists import MvNormalMeanScalePrecision as MSP

        return MSP(e_mean(q["out"]), e_precision(q["gamma"]))

    @staticmethod
    def message_to_gamma(q):
        c = _mv_centered_second_moment(q)
        d = c.shape[-1]
        tr = jnp.einsum("...ii->...", c)
        return GammaShapeRate(jnp.full_like(tr, 1.0 + 0.5 * d), 0.5 * tr)

    @staticmethod
    def average_energy(q):
        c = _mv_centered_second_moment(q)
        d = c.shape[-1]
        g = e_precision(q["gamma"])
        elogg = e_log_precision(q["gamma"])
        tr = jnp.einsum("...ii->...", c)
        return 0.5 * (d * _LOG2PI - d * elogg + g * tr)


@node("Multinomial")
class MultinomialNode:
    """out ~ Multinomial(n, p); interfaces out, n, p (reference Multinomial)."""

    interfaces = ("out", "n", "p")

    @staticmethod
    def message_to_p(q):
        from ..dists import Dirichlet as DirichletDist

        counts = e_mean(q["out"])
        return DirichletDist(1.0 + counts)

    @staticmethod
    def average_energy(q):
        from ..rules.nodes import _e_log_simplex

        counts = e_mean(q["out"])
        n = e_mean(q["n"])
        return -(
            gammaln(n + 1.0)
            - jnp.sum(gammaln(counts + 1.0), axis=-1)
            + jnp.sum(counts * _e_log_simplex(q["p"]), axis=-1)
        )


@node("Sum")
class SumNode:
    """Deterministic sum out = Σ in_i of Gaussian variables (reference '+' node,
    left-folded by the backend, src/model/graphppl.jl:58-83).  Deterministic
    nodes pass messages, not marginals: the engine's cavity store divides out
    this factor's previous messages (exact BP on trees)."""

    uses_cavity = True

    @staticmethod
    def _terms(q):
        return sorted((k for k in q if k.startswith("in")), key=lambda k: int(k[2:]))

    @staticmethod
    def _is_mv(d):
        from ..dists.gaussian import AbstractMvNormal

        return isinstance(d, AbstractMvNormal) or (
            isinstance(d, PointMass) and jnp.ndim(d.point) >= 1
        )

    # -- natural-form Gaussian convolution algebra -------------------------------
    # Cavity messages may carry singular precision (e.g. a dot-product
    # likelihood informs only one direction of a vector sum), so moment-form
    # arithmetic (means/covariances) is NaN-prone.  Convolution of Gaussian
    # messages is done directly on (xi, W):
    #   conv((xi1,W1),(xi2,W2)) = (W2 S xi1 + W1 S xi2, W1 S W2), S=(W1+W2)^-1
    # which is exact and finite whenever the *pair* is jointly informative,
    # even if each side alone is flat or rank-deficient.  The zero natural
    # vector stays the identity (flat message).
    @staticmethod
    def _nat(d):
        """(xi, w, mv?) for a Gaussian-family carrier; PointMass handled by
        callers (exact shift)."""
        from ..dists.gaussian import (
            AbstractMvNormal,
            as_mv_weighted_mean_precision,
            as_weighted_mean_precision,
        )

        if isinstance(d, AbstractMvNormal):
            f = as_mv_weighted_mean_precision(d)
            return f.xi, f.w, True
        f = as_weighted_mean_precision(d)
        return f.xi, f.w, False

    @staticmethod
    def _conv(n1, n2, mv):
        xi1, w1 = n1
        xi2, w2 = n2
        if mv:
            s = w1 + w2
            a1 = jnp.linalg.solve(s, xi1)
            a2 = jnp.linalg.solve(s, xi2)
            sw2 = jnp.linalg.solve(s, w2)
            return w2 @ a1 + w1 @ a2, w1 @ sw2
        s = w1 + w2
        return (w2 * xi1 + w1 * xi2) / s, w1 * w2 / s

    @classmethod
    def _conv_terms(cls, q, keys):
        """Convolution of the listed Gaussian terms plus PointMass shift.

        Returns ((xi, w) or None if all terms are PointMass, shift, mv)."""
        shift = None
        nat = None
        mv = False
        for k in keys:
            d = q[k]
            if isinstance(d, PointMass):
                shift = d.point if shift is None else shift + d.point
                mv = mv or jnp.ndim(d.point) >= 1
                continue
            xi, w, is_mv = cls._nat(d)
            mv = mv or is_mv
            nat = (xi, w) if nat is None else cls._conv(nat, (xi, w), is_mv)
        return nat, shift, mv

    @classmethod
    def message_to_out(cls, q):
        keys = cls._terms(q)
        nat, shift, mv = cls._conv_terms(q, keys)
        if nat is None:
            return PointMass(shift)
        xi, w = nat
        if shift is not None:
            xi = xi + (w @ shift if mv else w * shift)
        if mv:
            return MvNormalWeightedMeanPrecision(xi, w)
        return NormalWeightedMeanPrecision(xi, w)

    @classmethod
    def _message_to_in_i(cls, q, i):
        keys = [k for k in cls._terms(q) if k != f"in{i}"]
        # in_i = out - sum(others): negate the others' convolution, then
        # convolve with the out-side cavity.
        nat_o, shift_o, mv = cls._conv_terms(q, keys)
        out = q["out"]
        if isinstance(out, PointMass):
            if nat_o is None:
                return PointMass(out.point if shift_o is None else out.point - shift_o)
            xi, w = (-nat_o[0], nat_o[1])
            delta = out.point if shift_o is None else out.point - shift_o
            xi = xi + (w @ delta if mv else w * delta)
            return (
                MvNormalWeightedMeanPrecision(xi, w)
                if mv
                else NormalWeightedMeanPrecision(xi, w)
            )
        xi_out, w_out, out_mv = cls._nat(out)
        mv = mv or out_mv
        if nat_o is None:
            xi = xi_out if shift_o is None else (
                xi_out - (w_out @ shift_o if mv else w_out * shift_o)
            )
            return (
                MvNormalWeightedMeanPrecision(xi, w_out)
                if mv
                else NormalWeightedMeanPrecision(xi, w_out)
            )
        xi, w = cls._conv((xi_out, w_out), (-nat_o[0], nat_o[1]), mv)
        if shift_o is not None:
            xi = xi - (w @ shift_o if mv else w * shift_o)
        return (
            MvNormalWeightedMeanPrecision(xi, w)
            if mv
            else NormalWeightedMeanPrecision(xi, w)
        )

    @classmethod
    def bethe_term(cls, q):
        """Delta-node Bethe contribution -H[q(in_1..in_k)] from cavity
        messages: q(ins) ∝ Π N(x_i; a_i, V_i) · m_out(Σ x_i) with out-cavity
        N(b, W); joint precision J = diag(V⁻¹) + 11ᵀ/W (scalar) so by the
        determinant lemma logdet J = -Σ log V_i + log1p(ΣV_i / W).  On trees
        this makes total FE == -log Z exactly (reference: deterministic-node
        FactorBoundFreeEnergy via joint marginalrule + CountingReal)."""
        keys = [kk for kk in cls._terms(q) if not isinstance(q[kk], PointMass)]
        k = len(keys)
        mv = "Mv" in type(q[keys[0]]).__name__
        out_pm = isinstance(q["out"], PointMass)
        if out_pm:
            # out observed: q(ins) constrained to the hyperplane Σx = y —
            # a (k-1)·d-dim Gaussian; input cavities are proper here.
            if not mv:
                vs = [e_var(q[kk]) for kk in keys]
                return -0.5 * (k - 1) * _LOG2PIE + 0.5 * (
                    -sum(jnp.log(v) for v in vs) + jnp.log(sum(vs))
                )
            covs = [e_cov(q[kk]) for kk in keys]
            s = sum(covs)
            d = s.shape[-1]
            return -0.5 * (k - 1) * d * _LOG2PIE + 0.5 * (
                -sum(pd_logdet(v) for v in covs) + pd_logdet(s)
            )
        # Random out: joint precision over the inputs in natural form,
        # J = blockdiag(W_i) + (11ᵀ) ⊗ W_out — finite even when the out
        # cavity is rank-deficient (e.g. informed only through a dot).
        nats = [cls._nat(q[kk]) for kk in keys]
        _, w_out, out_mv = cls._nat(q["out"])
        d = nats[0][1].shape[-1] if mv else 1
        if not mv:
            jmat = jnp.diag(jnp.stack([n[1] for n in nats])) + w_out
        else:
            jmat = jnp.tile(w_out, (k, k))
            for i, (_, w_i, _) in enumerate(nats):
                jmat = jmat.at[i * d:(i + 1) * d, i * d:(i + 1) * d].add(w_i)
        logdet_j = jnp.linalg.slogdet(jmat)[1]
        return -0.5 * k * d * _LOG2PIE + 0.5 * logdet_j


class _DynamicInMeta(type):
    """Resolves message_to_in{i} dynamically via cls._message_to_in_i (variadic
    in-interfaces: Sum / GaussianSum)."""

    def __getattr__(cls, name):
        if name.startswith("message_to_in"):
            i = int(name[len("message_to_in"):])
            return lambda q: cls._message_to_in_i(q, i)
        raise AttributeError(name)


SumNode = _DynamicInMeta("SumNode", (SumNode,), {})
_NODES["Sum"] = SumNode


class LinCombNode:
    """Deterministic linear combination out = Σ A_i @ in_i + b of random
    vectors/scalars with known matrices (reference: composed ``*`` and ``+``
    deterministic nodes, e.g. ``x[t+1] ~ A * x[t] + B * u[t]`` in
    test/models/statespace/collision_tests.jl:66-68; left-fold registration
    src/model/graphppl.jl:58-83).

    Interfaces: in0..inK random, A0..AK / b constant (PointMass).  Messages are
    exact BP: forward pushes cavity moments through the maps; backward combines
    the out cavity with the other terms via the convolution identity
    W' = (I + W S)^-1 W (finite for rank-deficient out cavities) and pulls back
    through A_iᵀ (proper even for non-square, non-invertible A_i — e.g. a tall
    control matrix B informs only a subspace)."""

    uses_cavity = True

    @staticmethod
    def _terms(q):
        return sorted((k for k in q if k.startswith("in")), key=lambda k: int(k[2:]))

    @staticmethod
    def _amat(q, k, d_out):
        a = q[f"A{k[2:]}"].point
        if jnp.ndim(a) == 0:  # scalar multiplier: a * I on the shared space
            return a * jnp.eye(d_out)
        if jnp.ndim(a) == 1:
            if d_out == 1:  # row vector: scalar out, vector in
                return a[None, :]
            # column map: scalar in lifted into the d_out-dim out space
            return a[:, None]
        return a

    @staticmethod
    def _moments_vec(d):
        """(mean, cov) lifted to vector/matrix form."""
        m = jnp.asarray(e_mean(d))
        if jnp.ndim(m) == 0:
            return jnp.reshape(m, (1,)), jnp.reshape(e_var(d), (1, 1))
        return m, e_cov(d)

    @classmethod
    def _out_dim(cls, q):
        for k in q:
            if k.startswith("A") and k != "A":
                a = q[k].point
                if jnp.ndim(a) == 2:
                    return a.shape[0]
                if jnp.ndim(a) == 1:
                    return 1
        out = q.get("out")
        if out is not None:
            m = jnp.asarray(e_mean(out))
            if jnp.ndim(m) >= 1:
                return m.shape[-1]
        for k in cls._terms(q):
            m = jnp.asarray(e_mean(q[k]))
            if jnp.ndim(m) >= 1:
                return m.shape[-1]
        return 1

    @classmethod
    def _others(cls, q, skip=None):
        """Moments of Σ_{i≠skip} A_i in_i + b in the out space."""
        d_o = cls._out_dim(q)
        b_q = q.get("b")
        m = (
            jnp.reshape(jnp.asarray(b_q.point), (d_o,))
            if isinstance(b_q, PointMass) and jnp.ndim(jnp.asarray(b_q.point)) > 0
            else (jnp.full((d_o,), jnp.asarray(b_q.point)) if b_q is not None else jnp.zeros((d_o,)))
        )
        v = jnp.zeros((d_o, d_o))
        for k in cls._terms(q):
            if k == skip:
                continue
            a = cls._amat(q, k, d_o)
            mi, vi = cls._moments_vec(q[k])
            m = m + a @ mi
            v = v + a @ vi @ a.T
        return m, v

    @classmethod
    def message_to_out(cls, q):
        m, v = cls._others(q)
        if m.shape[-1] == 1:
            return NormalMeanVariance(m[0], v[0, 0])
        return MvNormalMeanCovariance(m, 0.5 * (v + v.T))

    @classmethod
    def _message_to_in_i(cls, q, i):
        from ..dists.gaussian import (
            AbstractMvNormal,
            as_mv_weighted_mean_precision,
            as_weighted_mean_precision,
        )

        d_o = cls._out_dim(q)
        out = q["out"]
        m_o, v_o = cls._others(q, skip=f"in{i}")
        a = cls._amat(q, f"in{i}", d_o)
        if isinstance(out, PointMass):
            # observed combination: residual uncertainty is the others' spread
            # (tiny ridge keeps a lone degenerate term invertible)
            p = jnp.reshape(jnp.asarray(out.point), (d_o,))
            w_t = jnp.linalg.inv(v_o + 1e-10 * jnp.eye(d_o))
            xi_t = w_t @ (p - m_o)
        else:
            if isinstance(out, AbstractMvNormal):
                f = as_mv_weighted_mean_precision(out)
                xi_c, w_c = f.xi, f.w
            else:
                f = as_weighted_mean_precision(out)
                xi_c = jnp.reshape(f.xi, (1,))
                w_c = jnp.reshape(f.w, (1, 1))
            # convolution with the others' distribution (negated mean shift):
            # W' = (I + W V_o)^-1 W, xi' = (I + W V_o)^-1 (xi - W m_o)
            g = jnp.eye(d_o) + w_c @ v_o
            w_t = jnp.linalg.solve(g, w_c)
            xi_t = jnp.linalg.solve(g, xi_c - w_c @ m_o)
        w_i = a.T @ w_t @ a
        xi_i = a.T @ xi_t
        scalar = a.shape[-1] == 1
        if scalar:
            return NormalWeightedMeanPrecision(xi_i[0], w_i[0, 0])
        return MvNormalWeightedMeanPrecision(xi_i, 0.5 * (w_i + w_i.T))


LinCombNode = _DynamicInMeta("LinCombNode", (LinCombNode,), {})
_NODES["LinComb"] = LinCombNode


# ---------------------------------------------------------------------------------
# GaussianSum: out ~ N(Σ in_i, noise) — compile-time contraction of
# Normal(mean = a + b + ..., var|precision = ...) with random terms (reference:
# anonymous '+' node contraction, src/model/graphppl.jl:58-83 +
# docs/src/manuals/model-specification.md:332-447).  Contracting keeps exact BP
# messages AND a well-defined average energy (a standalone delta Sum node has
# no Bethe energy term).
# ---------------------------------------------------------------------------------

class _GaussianSumScalarBase:
    uses_cavity = True

    @staticmethod
    def _terms(q):
        return sorted((k for k in q if k.startswith("in")), key=lambda k: int(k[2:]))

    @staticmethod
    def _noise_var(q):
        if "var" in q:
            return e_mean(q["var"])
        return 1.0 / e_precision(q["prec"])

    @classmethod
    def message_to_out(cls, q):
        keys = cls._terms(q)
        m = sum(e_mean(q[k]) for k in keys)
        v = sum(e_var(q[k]) for k in keys) + cls._noise_var(q)
        return NormalMeanVariance(m, v)

    @classmethod
    def _message_to_in_i(cls, q, i):
        keys = cls._terms(q)
        m = e_mean(q["out"]) - sum(e_mean(q[k]) for k in keys if k != f"in{i}")
        v = (
            e_var(q["out"])
            + sum(e_var(q[k]) for k in keys if k != f"in{i}")
            + cls._noise_var(q)
        )
        return NormalMeanVariance(m, v)

    @classmethod
    def _c2(cls, q):
        keys = cls._terms(q)
        diff = e_mean(q["out"]) - sum(e_mean(q[k]) for k in keys)
        return e_var(q["out"]) + sum(e_var(q[k]) for k in keys) + diff * diff

    @classmethod
    def average_energy(cls, q):
        if "prec" in q and not isinstance(q["prec"], PointMass):
            elogw = e_log_precision(q["prec"])
            w = e_precision(q["prec"])
        else:
            v = cls._noise_var(q)
            elogw = -jnp.log(v)
            w = 1.0 / v
        return 0.5 * (_LOG2PI - elogw + w * cls._c2(q))


class GaussianSumCovarianceNode(_GaussianSumScalarBase):
    pass


class GaussianSumPrecisionNode(_GaussianSumScalarBase):
    @classmethod
    def message_to_prec(cls, q):
        c2 = cls._c2(q)
        return GammaShapeRate(jnp.full_like(c2, 1.5), 0.5 * c2)


class _MvGaussianSumBase:
    uses_cavity = True

    @staticmethod
    def _terms(q):
        return sorted((k for k in q if k.startswith("in")), key=lambda k: int(k[2:]))

    @classmethod
    def message_to_out(cls, q):
        keys = cls._terms(q)
        m = sum(e_mean(q[k]) for k in keys)
        v = sum(e_cov(q[k]) for k in keys) + _lg_noise_cov(q)
        return MvNormalMeanCovariance(m, v)

    @classmethod
    def _message_to_in_i(cls, q, i):
        keys = cls._terms(q)
        m = e_mean(q["out"]) - sum(e_mean(q[k]) for k in keys if k != f"in{i}")
        v = (
            e_cov(q["out"])
            + sum(e_cov(q[k]) for k in keys if k != f"in{i}")
            + _lg_noise_cov(q)
        )
        return MvNormalMeanCovariance(m, v)

    @classmethod
    def _centered_second_moment(cls, q):
        keys = cls._terms(q)
        diff = e_mean(q["out"]) - sum(e_mean(q[k]) for k in keys)
        return (
            e_cov(q["out"])
            + sum(e_cov(q[k]) for k in keys)
            + diff[..., None] * diff[..., None, :]
        )

    @classmethod
    def average_energy(cls, q):
        c = cls._centered_second_moment(q)
        d = c.shape[-1]
        w = _lg_noise_prec(q)
        if "prec" in q and not isinstance(q["prec"], PointMass):
            elogdet = e_logdet(q["prec"])
        else:
            elogdet = -pd_logdet(_lg_noise_cov(q))
        return 0.5 * (d * _LOG2PI - elogdet + jnp.einsum("...ij,...ji->...", w, c))


class MvGaussianSumCovarianceNode(_MvGaussianSumBase):
    pass


class MvGaussianSumPrecisionNode(_MvGaussianSumBase):
    @classmethod
    def message_to_prec(cls, q):
        c = cls._centered_second_moment(q)
        d = c.shape[-1]
        return WishartInverseScale(jnp.full(c.shape[:-2], float(d) + 2.0), c)


for _name, _base in (
    ("GaussianSumCovariance", GaussianSumCovarianceNode),
    ("GaussianSumPrecision", GaussianSumPrecisionNode),
    ("MvGaussianSumCovariance", MvGaussianSumCovarianceNode),
    ("MvGaussianSumPrecision", MvGaussianSumPrecisionNode),
):
    _NODES[_name] = _DynamicInMeta(_name + "Node", (_base,), {})


@node("Uninformative")
class UninformativeNode:
    """Flat prior node (reference Uninformative)."""

    interfaces = ("out",)

    @staticmethod
    def message_to_out(q):
        del q
        return NormalWeightedMeanPrecision(jnp.asarray(0.0), jnp.asarray(1e-12))

    @staticmethod
    def average_energy(q):
        del q
        return jnp.asarray(0.0)
