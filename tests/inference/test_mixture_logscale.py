"""Per-message log-scale annotations on mixtures (reference
LogScaleAnnotations; assertions mirror
test/models/mixtures/mixture_tests.jl:93-109)."""

import numpy as np
from scipy.special import betaln

import rxinfer_tpu as rx


def _beta_model(a, b, n):
    @rx.model
    def m(y):
        theta = rx.Beta(a, b)
        for i in rx.plate(n):
            y[i] = rx.Bernoulli(theta)
        return {"theta": theta}

    return m


def test_mixture_component_bayes_factors():
    """theta ~ Mixture(selector, [Beta(4,8), Beta(8,4)]) with Bernoulli data:
    logscale(in_k) = log w_k + log Z_k (per-component Bayes factors);
    logscale(theta) = logscale(selector) = log Σ w_k Z_k; and each matches
    the standalone model's −FE (reference mixture_tests.jl:93-109)."""
    rng = np.random.default_rng(42)
    n = 20
    y = (rng.uniform(size=n) < 0.75).astype(np.float32)
    k = float(y.sum())

    # analytic per-model evidence: Z = B(a+k, b+n-k) / B(a, b)
    def log_z(a, b):
        return betaln(a + k, b + n - k) - betaln(a, b)

    lz1, lz2 = log_z(4.0, 8.0), log_z(8.0, 4.0)

    # standalone models: logscale == −FE == analytic log Z
    for (a, b), lz in (((4.0, 8.0), lz1), ((8.0, 4.0), lz2)):
        res = rx.infer(model=_beta_model(a, b, n), data={"y": y},
                       free_energy=True,
                       annotations=rx.LogScaleAnnotations())
        got = float(rx.getlogscale(res.posteriors["theta"]))
        assert abs(got - lz) < 1e-3, (got, lz)
        assert abs(got + float(res.free_energy[-1])) < 1e-3

    @rx.model
    def mix(y):
        selector = rx.Categorical(np.array([0.3, 0.7], np.float32))
        in1 = rx.Beta(4.0, 8.0)
        in2 = rx.Beta(8.0, 4.0)
        theta = rx.Mixture(selector, (in1, in2))
        for i in rx.plate(n):
            y[i] = rx.Bernoulli(theta)
        return {"selector": selector, "in1": in1, "in2": in2, "theta": theta}

    from rxinfer_tpu.dists import Beta as BD, NormalMeanVariance

    res = rx.infer(returnvars=rx.KeepLast(), 
        model=mix, data={"y": y}, iterations=10,
        annotations=rx.LogScaleAnnotations(),
        initialization={"in1": BD(4.0, 8.0), "in2": BD(8.0, 4.0),
                        "theta": BD(1.0, 1.0)},
    )
    ls_in1 = float(rx.getlogscale(res.posteriors["in1"]))
    ls_in2 = float(rx.getlogscale(res.posteriors["in2"]))
    ls_theta = float(rx.getlogscale(res.posteriors["theta"]))
    ls_sel = float(rx.getlogscale(res.posteriors["selector"]))

    # reference assertions: logscale(in_k) = log(w_k) + log Z_k
    assert abs(ls_in1 - (np.log(0.3) + lz1)) < 5e-3, (ls_in1,
                                                      np.log(0.3) + lz1)
    assert abs(ls_in2 - (np.log(0.7) + lz2)) < 5e-3
    lz_mix = np.logaddexp(np.log(0.3) + lz1, np.log(0.7) + lz2)
    assert abs(ls_theta - lz_mix) < 5e-3
    assert abs(ls_sel - lz_mix) < 5e-3


def test_logscale_gaussian_model_matches_logz():
    """Gaussian tree: logscale == −FE == analytic log Z."""
    rng = np.random.default_rng(0)
    n = 30
    v = 0.5
    y = (1.0 + np.sqrt(v) * rng.standard_normal(n)).astype(np.float32)

    @rx.model
    def m(y):
        mu = rx.Normal(mean=0.0, var=4.0)
        for i in rx.plate(n):
            y[i] = rx.Normal(mean=mu, var=v)
        return {"mu": mu}

    res = rx.infer(model=m, data={"y": y}, free_energy=True,
                   annotations=rx.LogScaleAnnotations())
    # analytic marginal likelihood of iid Gaussians with Gaussian prior
    from scipy.stats import multivariate_normal

    cov = v * np.eye(n) + 4.0 * np.ones((n, n))
    lz = multivariate_normal(np.zeros(n), cov).logpdf(y.astype(np.float64))
    got = float(rx.getlogscale(res.posteriors["mu"]))
    assert abs(got - lz) < 1e-2, (got, lz)
