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
    m, v = jnp.asarray(m), jnp.asarray(v)
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
    """Generic family-agnostic mixture: out = comp_{switch} (reference
    ``Mixture(switch=...)``, exercised by
    test/models/mixtures/mixture_tests.jl:60-109).

    Belief-propagation node (``uses_cavity``: the engine hands every rule the
    inbound MESSAGES on the other edges — marginal ÷ this node's previous
    outbound, exact at the fixed point):

      to out    — ``MixtureDist(switch-message weights, [m_comp_k ...])``;
                  its product with the conjugate likelihood distributes over
                  components, so the out posterior is a true mixture whose
                  ``component(k)`` equals the standalone model's posterior and
                  whose ``weights`` equal the switch responsibilities.
      to comp_k — pass-through of ``m_out`` (the out-edge cavity message):
                  q(comp_k) = prior_k × m_out, the reference semantics.
      to switch — per-component log-evidences ``log Z_k = A(η_k + η_out) −
                  A(η_k)`` (the shared −A(η_out) cancels in normalization).

    BP-only, like the reference: there is no average energy for the selection
    factor — evidence/Bayes factors flow through LogScaleAnnotations instead
    of Bethe FE."""

    uses_cavity = True

    @staticmethod
    def _k(q):
        return sum(1 for key in q if key.startswith("comp"))

    @staticmethod
    def _switch_logw(d):
        """Normalized (K,) log-weights from a Categorical or Bernoulli switch
        message (reference uses both; Bernoulli maps to [log(1-p), log p])."""
        from ..dists import BernoulliLogits
        from ..dists.natural import to_natural

        if isinstance(d, (Bernoulli, BernoulliLogits)):
            logit = to_natural(d)[0]
            return jnp.stack(
                [-jax.nn.softplus(logit), -jax.nn.softplus(-logit)], axis=-1
            )
        return jax.nn.log_softmax(d.logits, axis=-1)

    @staticmethod
    def _require_plain(d, edge):
        from ..dists.mixture import MixtureDist
        from ..dists.natural import family_key, from_natural, to_natural

        if isinstance(d, MixtureDist):
            raise TypeError(
                f"Mixture node: the {edge} edge carries a mixture-valued "
                "message where a plain conjugate message is required; "
                "initialize the mixture output with a plain (single-family) "
                "distribution."
            )
        # canonicalize to the natural carrier class: the scan-carried message
        # store needs a STABLE pytree type across sweeps (a Gaussian arrives
        # as mean-variance on the init sweep but weighted-mean-precision from
        # cavity division afterwards)
        return from_natural(family_key(d), to_natural(d))

    @classmethod
    def message_to_out(cls, q):
        from ..dists.mixture import MixtureDist

        k = cls._k(q)
        comps = tuple(
            cls._require_plain(q[f"comp{i}"], f"comp{i}") for i in range(k)
        )  # canonical carriers: the stored MixtureDist must be scan-stable
        return MixtureDist(cls._switch_logw(q["switch"]), comps)

    @classmethod
    def message_to_switch(cls, q):
        from ..dists.natural import family_key, log_partition, to_natural

        k = cls._k(q)
        out = cls._require_plain(q["out"], "out")
        fam = family_key(out)
        eta_out = to_natural(out)
        logits = []
        for i in range(k):
            eta_k = to_natural(q[f"comp{i}"])
            eta = tuple(a + b for a, b in zip(eta_k, eta_out))
            logits.append(log_partition(fam, eta) - log_partition(fam, eta_k))
        # always a Categorical carrier; the engine coerces it to a Bernoulli
        # for 2-component mixtures with a Bernoulli switch prior
        # (dists/natural.py coerce_message_family)
        return Categorical(jnp.stack(logits, axis=-1))

    @classmethod
    def _message_to_comp_i(cls, q, i):
        del i  # every component receives the same out-edge cavity message
        return cls._require_plain(q["out"], "out")

    @staticmethod
    def average_energy(q):
        raise NotImplementedError(
            "free_energy=True is not supported with the generic Mixture node "
            "— it is a belief-propagation selection factor with no average "
            "energy (reference parity: mixture models use "
            "annotations=LogScaleAnnotations() for evidence / Bayes factors, "
            "test/models/mixtures/mixture_tests.jl:60-109; VMP mixtures use "
            "NormalMixture/GammaMixture instead)."
        )


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
