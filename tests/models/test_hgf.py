"""Hierarchical Gaussian Filter — two coupled chains with GCV volatility
coupling (reference: test/models/statespace/hgf_tests.jl:10-71; structured
constraints q(x pairs) q(z pairs), mean-field between levels)."""

import numpy as np

import rxinfer_tpu as rx
from rxinfer_tpu.dists import NormalMeanVariance


def simulate_hgf(T, kappa=1.0, omega=-2.0, z_std=0.155, seed=0):
    rng = np.random.default_rng(seed)
    z = np.zeros(T)
    x = np.zeros(T)
    for t in range(1, T):
        z[t] = z[t - 1] + z_std * rng.standard_normal()
        x[t] = x[t - 1] + np.exp(0.5 * (kappa * z[t] + omega)) * rng.standard_normal()
    y = x + 0.1 * rng.standard_normal(T)
    return z, x, y.astype(np.float32)


def test_hgf_smoothing():
    T = 300
    kappa, omega = 1.0, -2.0
    z_true, x_true, y = simulate_hgf(T, kappa, omega, seed=3)

    @rx.model
    def hgf(y):
        z = rx.latent(T, name="z")
        x = rx.latent(T, name="x")
        z[0] = rx.Normal(mean=0.0, var=1.0)
        x[0] = rx.Normal(mean=0.0, var=1.0)
        for t in rx.plate(1, T):
            z[t] = rx.Normal(mean=z[t - 1], var=0.01)
            x[t] = rx.GCV(x[t - 1], z[t], kappa=kappa, omega=omega)
        for t in rx.plate(T):
            y[t] = rx.Normal(mean=x[t], var=0.01)
        return {"z": z, "x": x}

    res = rx.infer(returnvars=rx.KeepLast(), 
        model=hgf, data={"y": y}, iterations=20,
        initialization={"z": NormalMeanVariance(0.0, 5.0)},
        free_energy=True,
    )
    qx = res.posteriors["x"]
    qz = res.posteriors["z"]

    # x tracks truth tightly (obs noise is small)
    x_err = np.abs(np.asarray(qx.mean()) - x_true)
    assert np.median(x_err) < 0.15, np.median(x_err)

    # z (volatility) correlates with the true log-volatility path
    z_mean = np.asarray(qz.mean())
    corr = np.corrcoef(z_mean[10:], z_true[10:])[0, 1]
    assert corr > 0.35, corr

    fe = np.asarray(res.free_energy)
    assert np.isfinite(fe).all()
    # FE should improve substantially from the first iteration
    assert fe[-1] < fe[0]
