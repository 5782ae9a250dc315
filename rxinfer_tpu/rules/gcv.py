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
    """E[(out - in)^2] under the structured pairwise marginal."""
    m_out, v_out = e_mean(q["out"]), e_var(q["out"])
    m_in, v_in = e_mean(q["in"]), e_var(q["in"])
    cross = q.get("joint")
    c = cross if cross is not None else 0.0
    return v_out + v_in - 2.0 * c + (m_out - m_in) ** 2


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

    @staticmethod
    def message_to_out(q):
        return NormalWeightedMeanPrecision(
            e_mean(q["in"]) * expected_precision(q), expected_precision(q)
        )

    @staticmethod
    def message_to_in(q):
        p = expected_precision(q)
        return NormalWeightedMeanPrecision(e_mean(q["out"]) * p, p)

    @staticmethod
    def message_to_z(q):
        """Tilted moment matching: q*(z) ∝ q(z) exp(-(kz+w)/2 - d2/2 e^{-kz-w});
        message = q*/q via natural subtraction (GH quadrature per copy)."""
        k = _const(q, "kappa", 1.0)
        w = _const(q, "omega", 0.0)
        d2 = _delta2(q)
        mz, vz = e_mean(q["z"]), e_var(q["z"])

        def logl(z):  # z has a trailing quadrature axis
            return -0.5 * (k * z + w) - 0.5 * d2[..., None] * jnp.exp(-k * z - w)

        # stabilizer: log-likelihood at the current mean (no quadrature axis)
        logl0 = -0.5 * (k * mz + w) - 0.5 * d2 * jnp.exp(-k * mz - w)

        # normalized tilted moments by quadrature under q(z)
        w0 = _gauss_hermite(lambda z: jnp.exp(logl(z) - logl0[..., None]), mz, vz)
        m1 = _gauss_hermite(
            lambda z: z * jnp.exp(logl(z) - logl0[..., None]), mz, vz
        ) / w0
        m2 = _gauss_hermite(
            lambda z: z * z * jnp.exp(logl(z) - logl0[..., None]), mz, vz
        ) / w0
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
