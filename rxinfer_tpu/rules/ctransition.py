"""ContinuousTransition node: out = A(theta) @ in + noise with a RANDOM
vectorized transition matrix theta = vec(A), A of shape (dy, dx), row-major.

Reference: ReactiveMP ContinuousTransition (CTransition) node — state-space
models with learned transition/emission operators (SURVEY.md §2.2).

Conjugate messages:
  to theta: log f is quadratic in theta: -1/2 theta^T (E[W] ⊗ E[x x^T]) theta
            + theta^T vec(E[W] E[out] E[in]^T)   (row-major Kronecker layout),
  to prec:  Wishart carrier from the moment-matched residual scatter,
  to out / in: linear-Gaussian messages at E[A] with the theta-uncertainty
            inflation term E[A S A^T] - E[A] S E[A]^T folded into the noise.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..dists import (
    MvNormalMeanCovariance,
    MvNormalWeightedMeanPrecision,
)
from ..dists.gaussian import pd_inverse
from ..dists.matrix import WishartInverseScale
from .expectations import (
    e_cov,
    e_logdet,
    e_mean,
    e_outer,
    e_precision,
)
from .registry import node

_LOG2PI = 1.8378770664093453


def _dims(q):
    dy = e_mean(q["out"]).shape[-1]
    dx = e_mean(q["in"]).shape[-1]
    return dy, dx


def _e_a(q, dy, dx):
    return e_mean(q["theta"]).reshape(e_mean(q["theta"]).shape[:-1] + (dy, dx))


def _theta_cov_blocks(q, dy, dx):
    """Cov(theta) reshaped to (dy, dx, dy, dx) blocks."""
    c = e_cov(q["theta"])
    return c.reshape(c.shape[:-2] + (dy, dx, dy, dx))


@node("ContinuousTransition")
class ContinuousTransitionNode:
    interfaces = ("out", "in", "theta", "prec")

    @classmethod
    def _residual_scatter(cls, q):
        dy, dx = _dims(q)
        a = _e_a(q, dy, dx)
        s_in = e_outer(q["in"])                       # E[x x^T]
        m_out = e_mean(q["out"])
        m_in = e_mean(q["in"])
        diff = m_out - jnp.einsum("...ij,...j->...i", a, m_in)
        c = (
            e_cov(q["out"])
            + jnp.einsum("...ij,...jk,...lk->...il", a, e_cov(q["in"]), a)
            + diff[..., :, None] * diff[..., None, :]
        )
        # theta-uncertainty inflation: E[A S A^T] - E[A] S E[A]^T
        tc = _theta_cov_blocks(q, dy, dx)
        c = c + jnp.einsum("...ijkl,...jl->...ik", tc, s_in)
        joint = q.get("joint")
        if joint is not None:  # Cov(out, in)
            cr = jnp.einsum("...ij,...kj->...ik", joint, a)
            c = c - cr - jnp.swapaxes(cr, -1, -2)
        return c

    @classmethod
    def message_to_theta(cls, q):
        dy, dx = _dims(q)
        w = e_precision(q["prec"])
        s_in = e_outer(q["in"])
        m_out, m_in = e_mean(q["out"]), e_mean(q["in"])
        e_yx = m_out[..., :, None] * m_in[..., None, :]
        joint = q.get("joint")
        if joint is not None:  # joint = Cov(out, in): E[y x^T] = Cov + m m^T
            e_yx = e_yx + joint
        # W_theta = W ⊗ S (row-major vec), xi = vec(W E[y x^T])
        kron = jnp.einsum("...ik,...jl->...ijkl", w, s_in)
        w_theta = kron.reshape(kron.shape[:-4] + (dy * dx, dy * dx))
        wyx = jnp.einsum("...ij,...jk->...ik", w, e_yx)
        xi = wyx.reshape(wyx.shape[:-2] + (dy * dx,))
        return MvNormalWeightedMeanPrecision(xi, w_theta)

    @classmethod
    def message_to_prec(cls, q):
        c = cls._residual_scatter(q)
        d = c.shape[-1]
        return WishartInverseScale(jnp.full(c.shape[:-2], float(d) + 2.0), c)

    @classmethod
    def message_to_out(cls, q):
        dy, dx = _dims(q)
        a = _e_a(q, dy, dx)
        s_in = e_outer(q["in"])
        tc = _theta_cov_blocks(q, dy, dx)
        infl = jnp.einsum("...ijkl,...jl->...ik", tc, s_in)
        noise = pd_inverse(e_precision(q["prec"])) + infl
        mean = jnp.einsum("...ij,...j->...i", a, e_mean(q["in"]))
        cov = jnp.einsum("...ij,...jk,...lk->...il", a, e_cov(q["in"]), a) + noise
        return MvNormalMeanCovariance(mean, cov)

    @classmethod
    def message_to_in(cls, q):
        dy, dx = _dims(q)
        a = _e_a(q, dy, dx)
        w = e_precision(q["prec"])
        # backward info message at E[A] (theta-uncertainty folded into noise)
        tc = _theta_cov_blocks(q, dy, dx)
        infl = jnp.einsum("...ijkl,...jl->...ik", tc, e_outer(q["in"]))
        s = pd_inverse(w) + e_cov(q["out"]) + infl
        s_inv = pd_inverse(s)
        at_sinv = jnp.einsum("...ji,...jk->...ik", a, s_inv)
        w_msg = jnp.einsum("...ik,...kj->...ij", at_sinv, a)
        xi = jnp.einsum("...ik,...k->...i", at_sinv, e_mean(q["out"]))
        return MvNormalWeightedMeanPrecision(xi, w_msg)

    @classmethod
    def average_energy(cls, q):
        c = cls._residual_scatter(q)
        d = c.shape[-1]
        w = e_precision(q["prec"])
        from ..dists import PointMass

        if isinstance(q["prec"], PointMass):
            elogdet = -jnp.linalg.slogdet(pd_inverse(w))[1]
        else:
            elogdet = e_logdet(q["prec"])
        return 0.5 * (
            d * _LOG2PI - elogdet + jnp.einsum("...ij,...ji->...", w, c)
        )
