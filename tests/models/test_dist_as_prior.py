"""Distribution objects as priors in model arguments + unknown-object errors.

Mirrors /root/reference/test/models/models_tests.jl:
- :45-109  "A `Distribution` object as priors in arguments" — passing a
  built distribution object as a model argument and writing `θ ~ prior`
  must give the same posterior and free energy as spelling the parameters.
- :203-218 "Unknown object in the model specification should throw a
  user-friendly error".
"""

import numpy as np
import pytest

import rxinfer_tpu as rx
from rxinfer_tpu.dists import Beta as BetaDist
from rxinfer_tpu.dists import GammaShapeRate, NormalMeanPrecision


def _beta_bernoulli_prior_model():
    @rx.model
    def m(y, prior):
        theta = prior
        for i in rx.plate(len(y)):
            y[i] = rx.Bernoulli(theta)
        return {"theta": theta}

    return m


def _beta_bernoulli_params_model():
    @rx.model
    def m(y, a, b):
        theta = rx.Beta(a, b)
        for i in rx.plate(len(y)):
            y[i] = rx.Bernoulli(theta)
        return {"theta": theta}

    return m


@pytest.mark.parametrize("seed,n", [(123, 50), (456, 100)])
@pytest.mark.parametrize("a,b", [(4.0, 8.0), (54.0, 1.0), (1.0, 12.0)])
def test_beta_bernoulli_prior_object_matches_params(seed, n, a, b):
    rng = np.random.default_rng(seed)
    data = (rng.uniform(size=n) < 0.75).astype(np.float32)
    trues = float(data.sum())
    falses = float(n - data.sum())

    res_prior = rx.infer(
        model=_beta_bernoulli_prior_model()(prior=BetaDist(a, b)),
        data={"y": data}, iterations=10, free_energy=True,
        returnvars=rx.KeepLast(),
    )
    res_params = rx.infer(
        model=_beta_bernoulli_params_model()(a=a, b=b),
        data={"y": data}, iterations=10, free_energy=True,
        returnvars=rx.KeepLast(),
    )
    q1, q2 = res_prior.posteriors["theta"], res_params.posteriors["theta"]
    # exact conjugate answer: Beta(a + #1s, b + #0s)
    np.testing.assert_allclose(float(q1.a), a + trues, rtol=1e-6)
    np.testing.assert_allclose(float(q1.b), b + falses, rtol=1e-6)
    np.testing.assert_allclose(float(q2.a), float(q1.a), rtol=1e-6)
    np.testing.assert_allclose(float(q2.b), float(q1.b), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(res_prior.free_energy), np.asarray(res_params.free_energy),
        rtol=1e-5,
    )


def test_prior_object_used_twice_is_one_latent():
    """Two uses of the same dist object share one lifted random variable."""

    @rx.model
    def m(y, z, prior):
        theta = prior
        y.observe(rx.Bernoulli(theta))
        z.observe(rx.Bernoulli(theta))
        return {"theta": theta}

    res = rx.infer(
        model=m(prior=BetaDist(2.0, 2.0)),
        data={"y": np.float32(1.0), "z": np.float32(1.0)},
        returnvars=rx.KeepLast(),
    )
    q = res.posteriors["theta"]
    assert float(q.a) == pytest.approx(4.0)
    assert float(q.b) == pytest.approx(2.0)


def test_gamma_and_normal_prior_objects():
    """Dist-as-arg lift covers non-Beta families (Gamma-rate, Normal-precision
    conjugate updates both hit their exact fixed points)."""

    @rx.model
    def m(y, mu_prior, tau_prior):
        tau = tau_prior
        mu = mu_prior
        for i in rx.plate(len(y)):
            y[i] = rx.Normal(mean=mu, precision=tau)
        return {"mu": mu, "tau": tau}

    rng = np.random.default_rng(7)
    data = rng.normal(2.0, 0.5, size=64).astype(np.float32)
    res = rx.infer(
        model=m(mu_prior=NormalMeanPrecision(0.0, 0.1),
                tau_prior=GammaShapeRate(2.0, 2.0)),
        data={"y": data}, iterations=20, returnvars=rx.KeepLast(),
        free_energy=True,
    )
    mu_hat = float(res.posteriors["mu"].mean())
    assert abs(mu_hat - data.mean()) < 0.1
    fe = np.asarray(res.free_energy)
    assert np.all(fe[1:] <= fe[:-1] + 1e-4)


def test_unknown_object_raises_friendly_error():
    class SomeArbitraryDistribution:
        def __init__(self, a, b):
            self.a, self.b = a, b

    @rx.model
    def m(y):
        theta = SomeArbitraryDistribution(1.0, 2.0)
        for i in rx.plate(len(y)):
            y[i] = rx.Bernoulli(theta)
        return {"theta": theta}

    with pytest.raises(TypeError, match="cannot be used as a factor-node"):
        rx.infer(model=m, data={"y": np.ones(3, np.float32)})
