"""Additional nodes: Probit (binary classification), GammaMixture.

Reference: Probit node (test/models/nonlinear/probit tests; EP moment-matching
messages) and GammaMixture (test/models/mixtures/gamma_mixture_tests.jl).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import log_ndtr
from jax.scipy.stats import norm

from ..dists import (
    Bernoulli,
    Categorical,
    GammaShapeRate,
    NormalWeightedMeanPrecision,
)
from jax.scipy.special import gammaln
from .expectations import e_log, e_mean, e_sq, e_var
from .registry import node

_GH_POINTS = 31


def _gauss_hermite(fn, m, v, n=_GH_POINTS):
    """E[fn(x)] under N(m, v) by Gauss-Hermite quadrature (static nodes/weights,
    unrolled at trace time — the reference uses GaussHermiteCubature meta)."""
    import numpy as np

    x, w = np.polynomial.hermite_e.hermegauss(n)
    x = jnp.asarray(x, jnp.float32)
    w = jnp.asarray(w / np.sqrt(2 * np.pi) * np.sqrt(2 * np.pi), jnp.float32)
    w = w / jnp.sum(w)
    pts = m[..., None] + jnp.sqrt(v)[..., None] * x
    return jnp.sum(w * fn(pts), axis=-1)


@node("Probit")
class ProbitNode:
    """out ∈ {0,1} ~ Bernoulli(Φ(in)) with Gaussian in.

    Backward message by EP moment matching: tilted moments of N(x; m, v)Φ(sx)
    (closed form), divided by the marginal (cavity recipe shared with the
    nonlinear nodes)."""

    interfaces = ("out", "in")
    needs_self_marginal = True

    @staticmethod
    def message_to_out(q):
        m, v = e_mean(q["in"]), e_var(q["in"])
        p = norm.cdf(m / jnp.sqrt(1.0 + v))
        return Bernoulli(jnp.clip(p, 1e-7, 1 - 1e-7))

    @staticmethod
    def message_to_in(q):
        y = e_mean(q["out"])
        s = 2.0 * y - 1.0
        m, v = e_mean(q["in"]), e_var(q["in"])
        denom = jnp.sqrt(1.0 + v)
        z = s * m / denom
        # phi(z)/Phi(z), numerically stable via log_ndtr
        log_npdf = -0.5 * (z * z) - 0.9189385332046727
        ratio = jnp.exp(log_npdf - log_ndtr(z))
        mt = m + s * v * ratio / denom
        vt = v - (v * v) * ratio * (z + ratio) / (1.0 + v)
        vt = jnp.clip(vt, 1e-10)
        # message = tilted / marginal (natural subtraction)
        w_msg = 1.0 / vt - 1.0 / v
        xi_msg = mt / vt - m / v
        return NormalWeightedMeanPrecision(xi_msg, w_msg)

    @staticmethod
    def average_energy(q):
        y = e_mean(q["out"])
        s = 2.0 * y - 1.0
        m, v = e_mean(q["in"]), e_var(q["in"])
        return -_gauss_hermite(lambda x: log_ndtr(s[..., None] * x), m, v)


@node("GammaMixture")
class GammaMixtureNode:
    """out ~ prod_k Gamma(out; a_k, b_k)^{s_k} (reference GammaMixture)."""

    @staticmethod
    def _k(q):
        return sum(1 for key in q if key.startswith("shape"))

    @staticmethod
    def _resp(q):
        d = q["switch"]
        return d.mean()

    @classmethod
    def message_to_out(cls, q):
        k = cls._k(q)
        r = cls._resp(q)
        shape = sum(r[..., i] * (e_mean(q[f"shape{i}"]) - 1.0) for i in range(k)) + 1.0
        rate = sum(r[..., i] * e_mean(q[f"rate{i}"]) for i in range(k))
        return GammaShapeRate(shape, rate)

    @classmethod
    def message_to_switch(cls, q):
        k = cls._k(q)
        logits = []
        for i in range(k):
            a = e_mean(q[f"shape{i}"])
            elogb = e_log(q[f"rate{i}"])
            b = e_mean(q[f"rate{i}"])
            logits.append(
                (a - 1.0) * e_log(q["out"]) - b * e_mean(q["out"])
                + a * elogb - gammaln(a)
            )
        return Categorical(jnp.stack(logits, axis=-1))

    @classmethod
    def _message_to_rate_i(cls, q, i):
        r = cls._resp(q)[..., i]
        a = e_mean(q[f"shape{i}"])
        return GammaShapeRate(r * a + 1.0, r * e_mean(q["out"]))

    @classmethod
    def average_energy(cls, q):
        k = cls._k(q)
        r = cls._resp(q)
        total = 0.0
        for i in range(k):
            a = e_mean(q[f"shape{i}"])
            total = total + r[..., i] * (
                -(a - 1.0) * e_log(q["out"])
                + e_mean(q[f"rate{i}"]) * e_mean(q["out"])
                - a * e_log(q[f"rate{i}"])
                + gammaln(a)
            )
        return total


def _gamma_mixture_getattr(name):
    if name.startswith("message_to_rate"):
        i = int(name[len("message_to_rate"):])
        return lambda q: GammaMixtureNode._message_to_rate_i(q, i)
    raise AttributeError(name)


class _GammaMixtureMeta(type):
    def __getattr__(cls, name):
        return _gamma_mixture_getattr(name)


GammaMixtureNode = _GammaMixtureMeta("GammaMixtureNode", (GammaMixtureNode,), {})
from .registry import _NODES  # noqa: E402

_NODES["GammaMixture"] = GammaMixtureNode


@node("SoftDot")
class SoftDotNode:
    """out ~ N(theta^T x, 1/gamma) with BOTH theta and x random (reference
    SoftDot node — soft inner product for time-varying regression)."""

    interfaces = ("out", "theta", "x", "gamma")

    @staticmethod
    def _outer(d):
        from .expectations import e_cov

        m = e_mean(d)
        return e_cov(d) + m[..., None] * m[..., None, :], m

    @classmethod
    def message_to_out(cls, q):
        from ..dists import NormalMeanPrecision
        from .expectations import e_precision

        mt = e_mean(q["theta"])
        mx = e_mean(q["x"])
        return NormalMeanPrecision(
            jnp.einsum("...i,...i->...", mt, mx), e_precision(q["gamma"])
        )

    @classmethod
    def message_to_theta(cls, q):
        from ..dists import MvNormalWeightedMeanPrecision
        from .expectations import e_precision

        g = e_precision(q["gamma"])
        xx, mx = cls._outer(q["x"])
        y = e_mean(q["out"])
        return MvNormalWeightedMeanPrecision(
            g[..., None] * y[..., None] * mx if jnp.ndim(g) else g * y[..., None] * mx,
            (g[..., None, None] if jnp.ndim(g) else g) * xx,
        )

    @classmethod
    def message_to_x(cls, q):
        from ..dists import MvNormalWeightedMeanPrecision
        from .expectations import e_precision

        g = e_precision(q["gamma"])
        tt, mt = cls._outer(q["theta"])
        y = e_mean(q["out"])
        return MvNormalWeightedMeanPrecision(
            (g[..., None] if jnp.ndim(g) else g) * y[..., None] * mt,
            (g[..., None, None] if jnp.ndim(g) else g) * tt,
        )

    @classmethod
    def _c2(cls, q):
        tt, mt = cls._outer(q["theta"])
        xx, mx = cls._outer(q["x"])
        y = e_mean(q["out"])
        return (
            e_sq(q["out"])
            - 2.0 * y * jnp.einsum("...i,...i->...", mt, mx)
            + jnp.einsum("...ij,...ji->...", tt, xx)
        )

    @classmethod
    def message_to_gamma(cls, q):
        c2 = cls._c2(q)
        return GammaShapeRate(jnp.full_like(c2, 1.5), 0.5 * c2)

    @classmethod
    def average_energy(cls, q):
        from .expectations import e_log_precision, e_precision

        g = e_precision(q["gamma"])
        elogg = e_log_precision(q["gamma"])
        return 0.5 * (1.8378770664093453 - elogg + g * cls._c2(q))


@node("Mixture")
class MixtureNode:
    """Generic mixture: out = comp_{switch} (reference Mixture(switch=...)).

    Gaussian moment-matched messages; components are Gaussian-family marginals."""

    @staticmethod
    def _k(q):
        return sum(1 for key in q if key.startswith("comp"))

    @classmethod
    def message_to_out(cls, q):
        from ..dists import NormalMeanVariance

        k = cls._k(q)
        r = q["switch"].mean()
        m = sum(r[..., i] * e_mean(q[f"comp{i}"]) for i in range(k))
        second = sum(
            r[..., i] * (e_var(q[f"comp{i}"]) + e_mean(q[f"comp{i}"]) ** 2)
            for i in range(k)
        )
        return NormalMeanVariance(m, jnp.clip(second - m * m, 1e-10))

    @classmethod
    def message_to_switch(cls, q):
        k = cls._k(q)
        m_out, v_out = e_mean(q["out"]), e_var(q["out"])
        logits = []
        for i in range(k):
            mi, vi = e_mean(q[f"comp{i}"]), e_var(q[f"comp{i}"])
            s = v_out + vi
            logits.append(-0.5 * (jnp.log(s) + (m_out - mi) ** 2 / s))
        return Categorical(jnp.stack(logits, axis=-1))

    @classmethod
    def _message_to_comp_i(cls, q, i):
        r = q["switch"].mean()[..., i]
        m_out, v_out = e_mean(q["out"]), e_var(q["out"])
        w = r / jnp.clip(v_out, 1e-10)
        return NormalWeightedMeanPrecision(w * m_out, w)


def _mixture_getattr(name):
    if name.startswith("message_to_comp"):
        i = int(name[len("message_to_comp"):])
        return lambda q: MixtureNode._message_to_comp_i(q, i)
    raise AttributeError(name)


class _MixtureMeta(type):
    def __getattr__(cls, name):
        return _mixture_getattr(name)


MixtureNode = _MixtureMeta("MixtureNode", (MixtureNode,), {})
_NODES["Mixture"] = MixtureNode
