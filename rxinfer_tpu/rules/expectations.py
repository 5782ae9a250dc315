"""Sufficient-statistic expectation helpers shared by message rules.

Each helper accepts any distribution of the right support — including PointMass for
observed data / constants — and returns the expectation needed by conjugate VMP
updates (reference: the q_* rule argument convention,
docs/src/manuals/rules_and_nodes.md:31-66).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..dists import (
    Distribution,
    PointMass,
    Wishart,
    InverseWishart,
    pd_logdet,
)


def e_mean(d: Distribution):
    return d.mean()


def e_var(d: Distribution):
    if isinstance(d, PointMass):
        return jnp.zeros_like(d.point)
    return d.var()


def e_cov(d: Distribution):
    if isinstance(d, PointMass):
        p = jnp.asarray(d.point)
        dd = p.shape[-1]
        return jnp.zeros(p.shape[:-1] + (dd, dd), p.dtype)
    return d.cov()


def e_sq(d: Distribution):
    """E[x^2] (scalar support)."""
    m = d.mean()
    return e_var(d) + m * m


def e_outer(d: Distribution):
    """E[x x^T] (vector support)."""
    m = d.mean()
    return e_cov(d) + m[..., None] * m[..., None, :]


def e_precision(d: Distribution):
    """E[W] for a precision-valued variable (Gamma/Wishart/PointMass)."""
    if isinstance(d, PointMass):
        return d.point
    if isinstance(d, Wishart):
        nu = d.nu[..., None, None] if jnp.ndim(d.nu) else d.nu
        return nu * d.s
    return d.mean()


def e_log(d: Distribution):
    """E[log x] (Gamma/Beta/Dirichlet/PointMass support)."""
    if isinstance(d, PointMass):
        return jnp.log(d.point)
    return d.mean_log()


def e_mirrorlog(d: Distribution):
    if isinstance(d, PointMass):
        return jnp.log(1.0 - d.point)
    return d.mean_mirrorlog()


def e_logdet(d: Distribution):
    """E[log|X|] for matrix-valued X (Wishart/InverseWishart/PointMass)."""
    if isinstance(d, PointMass):
        return pd_logdet(d.point)
    if isinstance(d, (Wishart, InverseWishart)):
        return d.mean_logdet()
    raise TypeError(f"E[log|X|] undefined for {type(d).__name__}")


def e_inverse(d: Distribution):
    """E[X^{-1}] for matrix-valued X."""
    from ..dists import pd_inverse

    if isinstance(d, PointMass):
        return pd_inverse(d.point)
    if isinstance(d, InverseWishart):
        return d.mean_inverse()
    raise TypeError(f"E[X^-1] undefined for {type(d).__name__}")


def e_log_precision(d: Distribution):
    """E[log w] for a scalar precision (Gamma/PointMass)."""
    if isinstance(d, PointMass):
        return jnp.log(d.point)
    return d.mean_log()


def is_point(d: Distribution) -> bool:
    return isinstance(d, PointMass)
