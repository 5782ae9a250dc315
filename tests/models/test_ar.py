"""Latent AR model (reference: test/models/autoregressive — AR node with
unknown coefficients theta and innovation precision gamma)."""

import numpy as np

import rxinfer_tpu as rx
from rxinfer_tpu.dists import GammaShapeRate, MvNormalMeanCovariance


def simulate_ar(T, theta, sigma, seed=0):
    rng = np.random.default_rng(seed)
    k = len(theta)
    x = np.zeros(T + k, dtype=np.float64)
    for t in range(k, T + k):
        x[t] = theta @ x[t - k:t][::-1] + sigma * rng.standard_normal()
    return x[k:]


def test_latent_ar_learns_coefficients():
    theta_true = np.array([0.7, -0.2], dtype=np.float32)
    k = 2
    T = 400
    x_true = simulate_ar(T, theta_true, sigma=1.0, seed=6)
    y = (x_true + 0.3 * np.random.default_rng(7).standard_normal(T)).astype(np.float32)
    e1 = np.zeros(k, dtype=np.float32)
    e1[0] = 1.0

    @rx.model
    def latent_ar(y):
        theta = rx.MvNormal(mean=np.zeros(k, np.float32),
                            cov=np.float32(np.eye(k)))
        gamma = rx.Gamma(shape=1.0, rate=1.0)
        s = rx.latent(T, name="s")
        s[0] = rx.MvNormal(mean=np.zeros(k, np.float32),
                           cov=10.0 * np.float32(np.eye(k)))
        for t in rx.plate(1, T):
            s[t] = rx.AR(s[t - 1], theta, gamma, order=k)
        for t in rx.plate(T):
            y[t] = rx.Normal(mean=rx.dot(e1, s[t]), var=0.09)
        return {"theta": theta, "gamma": gamma, "s": s}

    res = rx.infer(returnvars=rx.KeepLast(), 
        model=latent_ar, data={"y": y}, iterations=30,
        initialization={
            "theta": MvNormalMeanCovariance(np.zeros(k, np.float32),
                                            np.float32(np.eye(k))),
            "gamma": GammaShapeRate(1.0, 1.0),
        },
        free_energy=True,
    )
    th = np.asarray(res.posteriors["theta"].mean())
    np.testing.assert_allclose(th, theta_true, atol=0.12)
    g = float(res.posteriors["gamma"].mean())
    assert abs(g - 1.0) < 0.4, g  # innovation precision 1/sigma^2 = 1

    # latent states track the truth
    s_mean = np.asarray(res.posteriors["s"].mean())[:, 0]
    corr = np.corrcoef(s_mean, x_true)[0, 1]
    assert corr > 0.95

    fe = np.asarray(res.free_energy)
    assert np.isfinite(fe).all()


def test_latent_ar_univariate_regime():
    """Univariate AR(1) with SCALAR latents and a scalar Normal θ prior —
    the reference lar_tests.jl `ARMeta(Univariate, order, ARsafe())` regime
    (test/models/autoregressive/lar_tests.jl:18-48)."""
    from rxinfer_tpu.dists import NormalMeanVariance

    rng = np.random.default_rng(0)
    T = 300
    theta_true = 0.8
    x = np.zeros(T)
    for t in range(1, T):
        x[t] = theta_true * x[t - 1] + rng.standard_normal()
    y = (x + 0.3 * rng.standard_normal(T)).astype(np.float32)

    @rx.model
    def ar1(y):
        theta = rx.Normal(mean=0.0, precision=1.0)
        gamma = rx.Gamma(shape=1.0, rate=1.0)
        s = rx.latent(T, name="s")
        s[0] = rx.Normal(mean=0.0, precision=1.0)
        for t in rx.plate(1, T):
            s[t] = rx.AR(s[t - 1], theta, gamma, order=1)
        for t in rx.plate(T):
            y[t] = rx.Normal(mean=s[t], var=0.09)
        return {"theta": theta, "gamma": gamma, "s": s}

    res = rx.infer(
        model=ar1, data={"y": y}, iterations=30, returnvars=rx.KeepLast(),
        free_energy=True,
        initialization={"theta": NormalMeanVariance(0.0, 1.0),
                        "gamma": GammaShapeRate(1.0, 1.0)},
    )
    assert abs(float(res.posteriors["theta"].mean()) - theta_true) < 0.1
    assert abs(float(res.posteriors["gamma"].mean()) - 1.0) < 0.3
    fe = np.asarray(res.free_energy)
    assert (np.diff(fe) <= 1e-3).all()
    s_mean = np.asarray(res.posteriors["s"].mean())
    assert np.corrcoef(s_mean, x)[0, 1] > 0.95
