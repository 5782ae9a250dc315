"""RequireMessageFunctionalDependencies: rules receiving the inbound message
on their own edge (reference docs/src/manuals/model-specification.md:471-480).

A custom EP probit node is defined whose backward rule is written in terms of
the *cavity message* m_in (the reference's ``m_`` argument) rather than the
full marginal — exactly the construction the reference documents for Probit
with ``dependencies = RequireMessageFunctionalDependencies(in = Normal...)``.
"""

import jax.numpy as jnp
import numpy as np
from jax.scipy.special import log_ndtr
from jax.scipy.stats import norm as jnorm
from scipy.stats import norm as sp_norm

import rxinfer_tpu as rx
from rxinfer_tpu.dists import Bernoulli, NormalMeanVariance, NormalWeightedMeanPrecision
from rxinfer_tpu.rules.expectations import e_mean, e_var
from rxinfer_tpu.rules.registry import node


@node("ProbitRM")
class ProbitRMNode:
    """EP probit written against the inbound message (standard EP form)."""

    interfaces = ("out", "in")

    @staticmethod
    def message_to_out(q):
        m, v = e_mean(q["in"]), e_var(q["in"])
        p = jnorm.cdf(m / jnp.sqrt(1.0 + v))
        return Bernoulli(jnp.clip(p, 1e-7, 1 - 1e-7))

    @staticmethod
    def message_to_in(q):
        # q["in"] is the CAVITY message (RequireMessage), not the marginal
        y = e_mean(q["out"])
        s = 2.0 * y - 1.0
        m = e_mean(q["in"])
        v = jnp.clip(e_var(q["in"]), 1e-8, 1e8)
        denom = jnp.sqrt(1.0 + v)
        z = s * m / denom
        log_npdf = -0.5 * (z * z) - 0.9189385332046727
        ratio = jnp.exp(log_npdf - log_ndtr(z))
        mt = m + s * v * ratio / denom
        vt = jnp.clip(v - (v * v) * ratio * (z + ratio) / (1.0 + v), 1e-10)
        # EP site update: message = tilted / cavity
        return NormalWeightedMeanPrecision(mt / vt - m / v, 1.0 / vt - 1.0 / v)

    @staticmethod
    def average_energy(q):
        from rxinfer_tpu.rules.special import _gauss_hermite

        y = e_mean(q["out"])
        s = 2.0 * y - 1.0
        m, v = e_mean(q["in"]), e_var(q["in"])
        return -_gauss_hermite(lambda x: log_ndtr(s[..., None] * x), m, v)


def test_require_message_probit_regression():
    rng = np.random.default_rng(4)
    n = 500
    theta_true = 0.8
    y = (rng.uniform(size=n) < sp_norm.cdf(theta_true)).astype(np.float32)

    @rx.model
    def probit(y):
        x = rx.Normal(mean=0.0, var=10.0)
        with rx.where(dependencies=rx.RequireMessage(
                in_=NormalMeanVariance(0.0, 10.0))):
            for i in rx.plate(n):
                y[i] = rx.factor_node("ProbitRM", **{"in": x})
        return {"x": x}

    res = rx.infer(returnvars=rx.KeepLast(), 
        model=probit, data={"y": y}, iterations=25,
        initialization={"x": NormalMeanVariance(0.0, 10.0)},
        free_energy=True,
    )
    est = float(res.posteriors["x"].mean())
    assert abs(sp_norm.cdf(est) - y.mean()) < 0.03
    fe = np.asarray(res.free_energy)
    assert np.isfinite(fe).all()
    # EP fixed point agrees with the builtin (marginal-division) probit
    @rx.model
    def probit_builtin(y):
        x = rx.Normal(mean=0.0, var=10.0)
        for i in rx.plate(n):
            y[i] = rx.Probit(x)
        return {"x": x}

    res_b = rx.infer(returnvars=rx.KeepLast(), 
        model=probit_builtin, data={"y": y}, iterations=25,
        initialization={"x": NormalMeanVariance(0.0, 10.0)},
    )
    assert abs(est - float(res_b.posteriors["x"].mean())) < 5e-3


def test_where_requires_model_context():
    import pytest

    with pytest.raises(RuntimeError):
        with rx.where(dependencies=rx.RequireMessage(in_=None)):
            pass
