"""Autoregressive (AR) node: order-k latent AR process in state-space embedding.

Reference: ReactiveMP AR node + ARMeta (latent AR model tests; SURVEY.md §2.2).
State s_t ∈ R^k stacks the last k values; the transition is the companion map
with random coefficient vector θ and innovation precision γ:

    s_t = C(θ) s_{t-1} + e_1 w_t,  w_t ~ N(0, 1/γ)

The chain itself is solved exactly by the Kalman block given E[θ], E[γ]
(engine/blocks.ARChainBlock); the rules here are the conjugate messages from the
transition factors to θ (Gaussian) and γ (Gamma), using the smoothed pairwise
cross-covariances (structured VMP)."""

from __future__ import annotations

import jax.numpy as jnp

from ..dists import GammaShapeRate, MvNormalWeightedMeanPrecision
from .expectations import (
    e_cov,
    e_log_precision,
    e_mean,
    e_outer,
    e_precision,
)
from .registry import node

_LOG2PI = 1.8378770664093453


def _is_scalar_ar(q) -> bool:
    """Univariate AR regime: order=1 with SCALAR latents and a scalar Normal
    θ prior (reference lar_tests.jl `ARMeta(Univariate, ...)`).  The chain
    block then carries scalar-family marginals; stats promote them to the
    1-d embedding and messages squeeze back."""
    from ..dists.gaussian import ScalarGaussians

    return isinstance(q["out"], ScalarGaussians)


def _promote(q):
    from ..dists import MvNormalMeanCovariance
    from ..dists.gaussian import ScalarGaussians

    out = dict(q)
    for key in ("out", "in", "theta"):
        d = out.get(key)
        if isinstance(d, ScalarGaussians):
            out[key] = MvNormalMeanCovariance(
                d.mean()[..., None], d.var()[..., None, None]
            )
    joint = out.get("joint")
    if joint is not None and jnp.ndim(joint) <= 1:
        out["joint"] = joint[..., None, None]
    return out


def _theta_outer(q):
    th = q["theta"]
    m = e_mean(th)
    return e_cov(th) + m[..., None] * m[..., None, :], m


def _ar_stats(q):
    """Batched per-transition sufficient statistics."""
    m_out = e_mean(q["out"])          # (T-1, k)
    m_in = e_mean(q["in"])            # (T-1, k)
    s_in = e_outer(q["in"])           # (T-1, k, k)  E[s s^T]
    joint = q.get("joint")            # Cov(out, in) (T-1, k, k) or None
    # E[out_0 * in] = Cov(out_0, in) + m_out0 * m_in
    if joint is not None:
        e_x0s = joint[..., 0, :] + m_out[..., 0:1] * m_in
    else:
        e_x0s = m_out[..., 0:1] * m_in
    v_out0 = e_cov(q["out"])[..., 0, 0]
    e_x0sq = v_out0 + m_out[..., 0] ** 2
    return m_out, m_in, s_in, e_x0s, e_x0sq


@node("AR")
class ARNode:
    interfaces = ("out", "in", "theta", "gamma")

    @staticmethod
    def message_to_theta(q):
        scalar = _is_scalar_ar(q)
        if scalar:
            q = _promote(q)
        g = e_precision(q["gamma"])
        _, _, s_in, e_x0s, _ = _ar_stats(q)
        if scalar:
            from ..dists import NormalWeightedMeanPrecision

            return NormalWeightedMeanPrecision(
                g * e_x0s[..., 0], g * s_in[..., 0, 0]
            )
        return MvNormalWeightedMeanPrecision(g * e_x0s, g * s_in)

    @staticmethod
    def message_to_gamma(q):
        if _is_scalar_ar(q):
            q = _promote(q)
        tt, mth = _theta_outer(q)
        _, _, s_in, e_x0s, e_x0sq = _ar_stats(q)
        c2 = (
            e_x0sq
            - 2.0 * jnp.einsum("...i,...i->...", mth, e_x0s)
            + jnp.einsum("...ij,...ji->...", tt, s_in)
        )
        return GammaShapeRate(jnp.full_like(c2, 1.5), 0.5 * c2)

    @staticmethod
    def average_energy(q):
        """E[-log N(out_0; θ^T in, 1/γ)] per transition copy.

        Only the stochastic first component contributes; the deterministic
        shift rows are delta factors whose energies cancel per CountingReal."""
        if _is_scalar_ar(q):
            q = _promote(q)
        g = e_precision(q["gamma"])
        elog_g = e_log_precision(q["gamma"])
        tt, mth = _theta_outer(q)
        _, _, s_in, e_x0s, e_x0sq = _ar_stats(q)
        c2 = (
            e_x0sq
            - 2.0 * jnp.einsum("...i,...i->...", mth, e_x0s)
            + jnp.einsum("...ij,...ji->...", tt, s_in)
        )
        return 0.5 * (_LOG2PI - elog_g + g * c2)
