"""Binomial regression via Polya-Gamma augmentation (reference:
Binomial/Multinomial-Polya regression tier-2 tests)."""

import numpy as np
from scipy.special import expit

import rxinfer_tpu as rx
from rxinfer_tpu.dists import MvNormalMeanCovariance


def test_binomial_polya_logistic_regression():
    rng = np.random.default_rng(0)
    n_obs, d = 400, 3
    beta_true = np.array([1.2, -0.8, 0.4])
    x = rng.standard_normal((n_obs, d)).astype(np.float32)
    trials = 20
    p = expit(x @ beta_true)
    y = rng.binomial(trials, p).astype(np.float32)

    @rx.model
    def logreg(x, y):
        beta = rx.MvNormal(mean=np.zeros(d, np.float32),
                           cov=10.0 * np.eye(d, dtype=np.float32))
        for i in rx.plate(n_obs):
            y[i] = rx.BinomialPolya(x[i], float(trials), beta)
        return {"beta": beta}

    res = rx.infer(returnvars=rx.KeepLast(), 
        model=logreg, data={"x": x, "y": y}, iterations=30,
        initialization={
            "beta": MvNormalMeanCovariance(np.zeros(d, np.float32),
                                           np.eye(d, dtype=np.float32))
        },
        free_energy=True,
    )
    est = np.asarray(res.posteriors["beta"].mean())
    np.testing.assert_allclose(est, beta_true, atol=0.15)
    fe = np.asarray(res.free_energy)
    assert np.isfinite(fe).all()
    # PG bound tightens monotonically (coordinate ascent on the augmented ELBO)
    assert (np.diff(fe) <= 5e-5 * np.abs(fe[:-1]) + 1e-3).all(), fe  # monotone non-increase (f32 tolerance)
