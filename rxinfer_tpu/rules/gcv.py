"""GCV (Gaussian Controlled Variance) node — the HGF building block.

Reference: ReactiveMP GCV node + GCVMetadata/GaussHermiteCubature
(docs/src/manuals/ inference on hierarchical Gaussian filters;
test/models/statespace/hgf_tests.jl:10-71).

    out ~ N(in, exp(kappa * z + omega))

The x-level chain treats exp-transformed expectations of q(z) as per-step
precisions (closed-form log-normal moments); the message to z is moment-matched
by Gauss-Hermite quadrature of the tilted density (the reference's
GaussHermiteCubature approximation), divided by the current marginal.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..dists import NormalWeightedMeanPrecision, PointMass
from .expectations import e_mean, e_var
from .registry import node
from .special import _gauss_hermite

_LOG2PI = 1.8378770664093453


def _const(q, name, default=None):
    v = q.get(name, default)
    if isinstance(v, PointMass):
        return v.point
    if v is None:
        return default
    return e_mean(v)


def _delta2(q):
    """E[(out - in)^2] under the structured pairwise marginal.

    The cross term is clamped to the Cauchy-Schwarz bound of the MARGINAL
    variances: mid-iteration the cavity-reconstructed cross can transiently
    exceed it (improper cavities under fast volatility), which would make the
    expected squared step negative and blow up the z-message quadrature."""
    m_out, v_out = e_mean(q["out"]), e_var(q["out"])
    m_in, v_in = e_mean(q["in"]), e_var(q["in"])
    cross = q.get("joint")
    if cross is None:
        c = 0.0
    else:
        bound = 0.999 * jnp.sqrt(jnp.clip(v_out * v_in, 0.0))
        c = jnp.clip(cross, -bound, bound)
    return jnp.clip(v_out + v_in - 2.0 * c + (m_out - m_in) ** 2, 1e-10)


def expected_precision(q):
    """E[exp(-(kappa z + omega))] — log-normal moment, closed form."""
    k = _const(q, "kappa", 1.0)
    w = _const(q, "omega", 0.0)
    mz, vz = e_mean(q["z"]), e_var(q["z"])
    return jnp.exp(-k * mz + 0.5 * k * k * vz - w)


@node("GCV")
class GCVNode:
    interfaces = ("out", "in", "z", "kappa", "omega")
    needs_self_marginal = True  # message_to_z divides out q(z)
    # Structured default: q(out, in) stays a joint cluster with q(z) across
    # the mean-field split — the reference HGF constraint
    # ``q(xt, zt, xt_min) = q(xt, xt_min)q(zt)``
    # (test/models/statespace/hgf_tests.jl:34-36) is this engine's default
    # for single-step GCV factors; the engine reconstructs the pair joint
    # from cavity messages (engine/blocks.py attach_gcv_pair_cross).
    cavity_cluster = ("out", "in")

    @staticmethod
    def message_to_out(q):
        """Structured-BP message: convolve the in-edge cavity with the
        expected-precision noise (exact for the joint (out,in) cluster).
        A transiently negative cavity variance (EP-style improper cavity)
        is floored so the outgoing message stays a proper density."""
        from ..dists import NormalMeanVariance

        v = e_var(q["in"]) + 1.0 / expected_precision(q)
        return NormalMeanVariance(e_mean(q["in"]), jnp.clip(v, 1e-8))

    @staticmethod
    def message_to_in(q):
        from ..dists import NormalMeanVariance

        v = e_var(q["out"]) + 1.0 / expected_precision(q)
        return NormalMeanVariance(e_mean(q["out"]), jnp.clip(v, 1e-8))

    @staticmethod
    def vmp_message_to_out(q):
        """Mean-field variant (factorized q(out)q(in) by constraint)."""
        return NormalWeightedMeanPrecision(
            e_mean(q["in"]) * expected_precision(q), expected_precision(q)
        )

    @staticmethod
    def vmp_message_to_in(q):
        p = expected_precision(q)
        return NormalWeightedMeanPrecision(e_mean(q["out"]) * p, p)

    @staticmethod
    def message_to_z(q):
        """Tilted moment matching: q*(z) ∝ q(z) exp(-(kz+w)/2 - d2/2 e^{-kz-w});
        message = q*/q via natural subtraction (GH quadrature per copy).

        Stabilized by the MAX of the log-likelihood over the quadrature grid
        (not its value at the mean): when d2 is large the tilted density
        peaks many natural-widths away from the current mean and a mean-point
        stabilizer overflows float32 (exp(>88))."""
        import numpy as np

        k = _const(q, "kappa", 1.0)
        w = _const(q, "omega", 0.0)
        d2 = _delta2(q)
        mz, vz = jnp.asarray(e_mean(q["z"])), jnp.asarray(e_var(q["z"]))

        xg, wg = np.polynomial.hermite_e.hermegauss(31)
        xg = jnp.asarray(xg, jnp.float32)
        wg = jnp.asarray(wg, jnp.float32)
        wg = wg / jnp.sum(wg)
        pts = mz[..., None] + jnp.sqrt(vz)[..., None] * xg   # (..., Q)
        logl = -0.5 * (k * pts + w) - 0.5 * d2[..., None] * jnp.exp(
            -k * pts - w
        )
        logl = logl - jnp.max(logl, axis=-1, keepdims=True)
        tw = wg * jnp.exp(logl)
        w0 = jnp.sum(tw, axis=-1)
        m1 = jnp.sum(tw * pts, axis=-1) / w0
        m2 = jnp.sum(tw * pts * pts, axis=-1) / w0
        vt = jnp.clip(m2 - m1 * m1, 1e-8)
        w_msg = 1.0 / vt - 1.0 / vz
        xi_msg = m1 / vt - mz / vz
        return NormalWeightedMeanPrecision(xi_msg, w_msg)

    @staticmethod
    def average_energy(q):
        """E[-log N(out; in, exp(kz+w))] with structured (out,in) pair and
        mean-field z (reference GCV average energy)."""
        k = _const(q, "kappa", 1.0)
        w = _const(q, "omega", 0.0)
        mz = e_mean(q["z"])
        return 0.5 * (
            _LOG2PI + k * mz + w + expected_precision(q) * _delta2(q)
        )
