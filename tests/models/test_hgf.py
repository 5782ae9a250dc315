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

    # reference-style credible envelopes (hgf_tests.jl:120-130): every state
    # within 6σ, ≥95% within 3σ, strictly positive posterior variances
    mx, sx = np.asarray(qx.mean()), np.sqrt(np.asarray(qx.var()))
    mz, sz = np.asarray(qz.mean()), np.sqrt(np.asarray(qz.var()))
    assert np.all(sx > 0) and np.all(sz > 0)
    assert np.all(np.abs(x_true - mx) < 6.0 * sx)
    assert np.all(np.abs(z_true - mz) < 6.0 * sz)
    assert np.mean(np.abs(x_true - mx) < 3.0 * sx) > 0.95
    assert np.mean(np.abs(z_true - mz) < 3.0 * sz) > 0.95

    # z (volatility) correlates with the true log-volatility path
    corr = np.corrcoef(mz[10:], z_true[10:])[0, 1]
    assert corr > 0.55, corr

    fe = np.asarray(res.free_energy)
    assert np.isfinite(fe).all()
    # FE discipline: the EP-style GCV chain coupling overshoots on the first
    # sweep (iter-1 FE undershoots, then corrects upward), so unlike pure
    # coordinate-ascent models the first few diffs may be positive; require
    # a large net improvement AND a monotone non-increasing converged tail.
    assert fe[-1] < fe[0] - 100.0, (fe[0], fe[-1])
    # converged: per-iteration change decays to float32 noise and the last
    # iterations are flat (the EP fixed point is approached from below, so
    # strict monotonicity does not apply here)
    diffs = np.diff(fe)
    assert np.abs(diffs[-5:]).max() < 1e-2, fe
    assert abs(fe[-1] - fe[-5]) < 1e-2, fe


def test_hgf_damped_fe_near_monotone():
    """Round-4 damping knob (reference asserts near-monotone FE decrease,
    hgf_tests.jl:119-121): meta={"GCV": {"damping": ...}} blends each GCV
    chain-evidence message with the previous sweep's in natural parameters,
    taming the EP-style overshoot that the undamped test above documents."""
    T = 200
    kappa, omega = 1.0, -2.0
    z_true, x_true, y = simulate_hgf(T, kappa, omega, seed=5)

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

    res = rx.infer(
        model=hgf, data={"y": y}, iterations=40,
        meta={"GCV": {"damping": 0.8}},
        initialization={"z": NormalMeanVariance(0.0, 5.0)},
        free_energy=True, returnvars=rx.KeepLast(),
    )
    fe = np.asarray(res.free_energy)
    assert np.isfinite(fe).all()
    # The EP fixed point is approached from BELOW on this model (the undamped
    # run dips ~7 under the converged FE and climbs back with per-iteration
    # increases up to ~3.3); damping=0.8 caps every increase at <0.25 —
    # near-monotone in the reference's sense (every LARGE step decreases,
    # hgf_tests.jl:120) while converging to the SAME fixed point (FE 74.82
    # on this seed for damping in {0, 0.3, 0.6, 0.8}).
    diffs = np.diff(fe)
    assert np.all(diffs < 0.25), diffs[diffs > 0]
    assert fe[-1] < fe[0] - 100.0
    # accuracy is not sacrificed: same envelopes as the undamped run
    mx, sx = np.asarray(res.posteriors["x"].mean()), np.sqrt(
        np.asarray(res.posteriors["x"].var()))
    assert np.mean(np.abs(x_true - mx) < 3.0 * sx) > 0.95
