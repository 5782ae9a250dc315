"""Bayesian linear regression via dot-product node (reference:
test/models/regression — exact conjugate posterior)."""

import numpy as np

import rxinfer_tpu as rx
from rxinfer_tpu.dists import GammaShapeRate, MvNormalMeanCovariance


def test_linear_regression_exact_posterior():
    rng = np.random.default_rng(7)
    n = 150
    x = rng.uniform(-3, 3, size=n).astype(np.float32)
    phi = np.stack([x, np.ones_like(x)], axis=1)  # slope + intercept features
    y = (2.5 * x - 1.0 + 0.5 * rng.standard_normal(n)).astype(np.float32)
    noise_var = 0.25

    @rx.model
    def linreg(phi, y):
        theta = rx.MvNormal(
            mean=np.zeros(2, np.float32), cov=100.0 * np.eye(2, dtype=np.float32)
        )
        for i in rx.plate(len(y)):
            y[i] = rx.Normal(mean=rx.dot(phi[i], theta), var=noise_var)
        return {"theta": theta}

    res = rx.infer(returnvars=rx.KeepLast(), model=linreg, data={"phi": phi, "y": y}, iterations=1,
                   free_energy=True)
    q = res.posteriors["theta"]

    # analytic posterior: W = Phi^T Phi / s2 + I/100 ; m = W^{-1} Phi^T y / s2
    w = phi.T @ phi / noise_var + np.eye(2) / 100.0
    m = np.linalg.solve(w, phi.T @ y / noise_var)
    np.testing.assert_allclose(q.mean(), m, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(q.precision(), w, rtol=1e-2)

    # FE = -log evidence for the exact conjugate model
    from scipy.stats import multivariate_normal

    cov_y = noise_var * np.eye(n) + 100.0 * phi @ phi.T
    log_z = multivariate_normal(np.zeros(n), cov_y).logpdf(y)
    fe = float(np.asarray(res.free_energy)[-1])
    assert np.isclose(fe, -log_z, rtol=1e-4, atol=0.5), (fe, -log_z)


def test_regression_unknown_noise_precision():
    rng = np.random.default_rng(8)
    n = 300
    x = rng.uniform(-2, 2, size=n).astype(np.float32)
    phi = np.stack([x, np.ones_like(x)], axis=1)
    y = (1.5 * x + 0.5 + 0.3 * rng.standard_normal(n)).astype(np.float32)

    @rx.model
    def linreg(phi, y):
        theta = rx.MvNormal(
            mean=np.zeros(2, np.float32), cov=100.0 * np.eye(2, dtype=np.float32)
        )
        w = rx.Gamma(shape=0.01, rate=0.01)
        for i in rx.plate(len(y)):
            y[i] = rx.Normal(mean=rx.dot(phi[i], theta), precision=w)
        return {"theta": theta, "w": w}

    res = rx.infer(returnvars=rx.KeepLast(), 
        model=linreg, data={"phi": phi, "y": y}, iterations=20,
        initialization={"w": GammaShapeRate(1.0, 1.0)}, free_energy=True,
    )
    th = np.asarray(res.posteriors["theta"].mean())
    assert abs(th[0] - 1.5) < 0.1
    assert abs(th[1] - 0.5) < 0.1
    prec = float(res.posteriors["w"].mean())
    assert abs(prec - 1 / 0.09) < 3.0
    fe = np.asarray(res.free_energy)
    assert (fe[1:] - fe[:-1] <= 5e-5 * np.abs(fe[:-1])).all()
