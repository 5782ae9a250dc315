"""ProjectedTo discrete targets — Bernoulli / Poisson / Binomial (round-4:
reference ProjectionExt.jl:24-67 is generic over ANY ProjectedTo(T)
ExponentialFamily family; these close the discrete gap).

Each family gets (a) an exact-recovery unit check of the natural-gradient
projection against a closed-form tilted target, and (b) for Bernoulli a
model-level form-constraint run with an analytically known posterior."""

import numpy as np
import jax.numpy as jnp

import rxinfer_tpu as rx
from rxinfer_tpu.dists import Bernoulli, BernoulliLogits, Binomial, Poisson
from rxinfer_tpu.engine.projection import project_logpdf


def test_project_bernoulli_exact_tilt():
    """Target ∝ Bernoulli(p0) · exp(eps·x) is Bernoulli(logit0 + eps) —
    the projection must recover it to MC precision."""
    logit0, eps = -0.4, 1.1
    base = BernoulliLogits(jnp.asarray(logit0))

    def logp(x):
        return base.logpdf(x) + eps * x

    q = project_logpdf("bernoulli", logp, BernoulliLogits(jnp.zeros(())),
                       n_iters=30, n_samples=2048, seed=0)
    assert abs(float(q.logit) - (logit0 + eps)) < 0.05, float(q.logit)


def test_project_poisson_exact_tilt():
    """Target ∝ Poisson(lam) · exp(eps·x) is Poisson(lam·e^eps)."""
    lam, eps = 3.0, 0.4
    base = Poisson(jnp.asarray(lam))

    def logp(x):
        return base.logpdf(x) + eps * x

    q = project_logpdf("poisson", logp, Poisson(jnp.ones(())),
                       n_iters=40, n_samples=4096, seed=1)
    target = lam * np.exp(eps)
    assert abs(float(q.lam) - target) / target < 0.05, float(q.lam)


def test_project_binomial_exact_tilt():
    """Target ∝ Binomial(n, p) · exp(eps·x) is Binomial(n, σ(logit p + eps))."""
    n, p, eps = 12.0, 0.35, 0.8
    base = Binomial(jnp.asarray(n), jnp.asarray(p))

    def logp(x):
        return base.logpdf(x) + eps * x

    q = project_logpdf("binomial", logp,
                       Binomial(jnp.asarray(n), jnp.full((), 0.5)),
                       n_iters=40, n_samples=4096, seed=2, n_trials=n)
    target = 1.0 / (1.0 + np.exp(-(np.log(p / (1 - p)) + eps)))
    assert abs(float(q.p) - target) < 0.03, float(q.p)


def test_binomial_requires_n():
    import pytest

    with pytest.raises(ValueError, match="n="):
        rx.ProjectedTo("binomial")


def test_bernoulli_latent_with_gaussian_evidence():
    """Model-level form constraint: x ~ Bernoulli(0.5) with Gaussian evidence
    y_i ~ N(2x, 1) — the Gaussian messages have no closed-form product with
    the Bernoulli prior; ProjectedTo('bernoulli') projects the product.
    Exact posterior: p(x=1) ∝ 0.5·Π N(y_i; 2, 1)."""
    rng = np.random.default_rng(3)
    n = 8
    y = (2.0 + rng.standard_normal(n)).astype(np.float32)

    @rx.model
    def m(y):
        x = rx.Bernoulli(0.5)
        for i in rx.plate(n):
            y[i] = rx.Normal(mean=rx.Delta(lambda b: 2.0 * b, x), var=1.0)
        return {"x": x}

    cs = rx.constraints(
        forms={"x": rx.ProjectedTo("bernoulli", n_samples=4096, n_iters=30)})
    res = rx.infer(model=m, data={"y": y}, iterations=6, constraints=cs,
                   returnvars=rx.KeepLast(),
                   initialization={"x": Bernoulli(np.float32(0.5))})
    q = res.posteriors["x"]
    l1 = np.sum(-0.5 * (y - 2.0) ** 2)
    l0 = np.sum(-0.5 * y**2)
    p_exact = 1.0 / (1.0 + np.exp(l0 - l1))
    assert abs(float(q.mean()) - p_exact) < 0.05, (float(q.mean()), p_exact)
