"""Nested plates: factor replication over products of plate axes (reference:
GraphPPL multi-axis broadcasting / nested loop indices in @model bodies,
docs/src/manuals/model-specification.md:255-274)."""

import numpy as np

import rxinfer_tpu as rx
from rxinfer_tpu.dists import GammaShapeRate


def test_grid_iid_matches_flat_model():
    """y[i,j] ~ N(mu, tau^-1) over an (N, M) grid == the same model over the
    flattened N*M vector (posterior and FE identical)."""
    rng = np.random.default_rng(0)
    N, M = 12, 7
    y = (1.5 + 0.7 * rng.standard_normal((N, M))).astype(np.float32)

    @rx.model
    def grid(y):
        mu = rx.Normal(mean=0.0, var=100.0)
        tau = rx.Gamma(shape=0.01, rate=0.01)
        for i in rx.plate(N):
            for j in rx.plate(M):
                y[i, j] = rx.Normal(mean=mu, precision=tau)
        return {"mu": mu, "tau": tau}

    @rx.model
    def flat(y):
        mu = rx.Normal(mean=0.0, var=100.0)
        tau = rx.Gamma(shape=0.01, rate=0.01)
        for i in rx.plate(N * M):
            y[i] = rx.Normal(mean=mu, precision=tau)
        return {"mu": mu, "tau": tau}

    init = {"tau": GammaShapeRate(1.0, 1.0)}
    rg = rx.infer(returnvars=rx.KeepLast(), model=grid, data={"y": y}, iterations=15, free_energy=True,
                  initialization=init)
    rf = rx.infer(returnvars=rx.KeepLast(), model=flat, data={"y": y.reshape(-1)}, iterations=15,
                  free_energy=True, initialization=init)
    np.testing.assert_allclose(float(rg.posteriors["mu"].mean()),
                               float(rf.posteriors["mu"].mean()), rtol=1e-6)
    np.testing.assert_allclose(float(rg.posteriors["tau"].mean()),
                               float(rf.posteriors["tau"].mean()), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rg.free_energy),
                               np.asarray(rf.free_energy), rtol=1e-5)


def test_grid_row_means_shared_precision():
    """y[i,j] ~ N(mu[i], tau^-1): per-row means (reduced over j only), pooled
    precision (reduced over both axes)."""
    rng = np.random.default_rng(1)
    N, M = 6, 200
    row_means = np.linspace(-3.0, 3.0, N).astype(np.float32)
    y = (row_means[:, None] + 0.5 * rng.standard_normal((N, M))).astype(np.float32)

    @rx.model
    def rows(y):
        tau = rx.Gamma(shape=0.01, rate=0.01)
        mu = rx.latent(N, name="mu")
        for i in rx.plate(N):
            mu[i] = rx.Normal(mean=0.0, var=100.0)
        for i in rx.plate(N):
            for j in rx.plate(M):
                y[i, j] = rx.Normal(mean=mu[i], precision=tau)
        return {"mu": mu, "tau": tau}

    res = rx.infer(returnvars=rx.KeepLast(), model=rows, data={"y": y}, iterations=20, free_energy=True,
                   initialization={"tau": GammaShapeRate(1.0, 1.0)})
    mu_hat = np.asarray(res.posteriors["mu"].mean())
    np.testing.assert_allclose(mu_hat, y.mean(axis=1), atol=0.05)
    # pooled precision ≈ 1/0.25 = 4
    assert abs(float(res.posteriors["tau"].mean()) - 4.0) < 0.5
    fe = np.asarray(res.free_energy)
    assert (np.diff(fe) <= 5e-5 * np.abs(fe[:-1]) + 1e-3).all(), fe  # monotone non-increase (f32 tolerance)


def test_grid_column_effects():
    """Inner-plate-indexed latent: y[i,j] ~ N(beta[j], 1) recovers per-column
    means (reduction over the OUTER axis)."""
    rng = np.random.default_rng(2)
    N, M = 300, 5
    col = np.array([2.0, -1.0, 0.5, 3.0, -2.5], np.float32)
    y = (col[None, :] + rng.standard_normal((N, M))).astype(np.float32)

    @rx.model
    def cols(y):
        beta = rx.latent(M, name="beta")
        for j in rx.plate(M):
            beta[j] = rx.Normal(mean=0.0, var=100.0)
        for i in rx.plate(N):
            for j in rx.plate(M):
                y[i, j] = rx.Normal(mean=beta[j], precision=1.0)
        return {"beta": beta}

    res = rx.infer(returnvars=rx.KeepLast(), model=cols, data={"y": y}, iterations=5)
    np.testing.assert_allclose(np.asarray(res.posteriors["beta"].mean()),
                               y.mean(axis=0), atol=0.01)


def test_grid_missing_data_mask():
    """NaNs in the grid are masked copies: posterior matches the model run on
    only the observed entries."""
    rng = np.random.default_rng(3)
    N, M = 10, 8
    y = (0.8 + rng.standard_normal((N, M))).astype(np.float32)
    y_missing = y.copy()
    y_missing[1, 2] = np.nan
    y_missing[7, 5] = np.nan
    y_missing[4, 0] = np.nan

    @rx.model
    def grid(y):
        mu = rx.Normal(mean=0.0, var=100.0)
        for i in rx.plate(N):
            for j in rx.plate(M):
                y[i, j] = rx.Normal(mean=mu, var=1.0)
        return {"mu": mu}

    @rx.model
    def flat(y):
        mu = rx.Normal(mean=0.0, var=100.0)
        for i in rx.plate(N * M - 3):
            y[i] = rx.Normal(mean=mu, var=1.0)
        return {"mu": mu}

    r1 = rx.infer(returnvars=rx.KeepLast(), model=grid, data={"y": y_missing}, iterations=3,
                  free_energy=True)
    obs = y_missing[np.isfinite(y_missing)].astype(np.float32)
    r2 = rx.infer(returnvars=rx.KeepLast(), model=flat, data={"y": obs}, iterations=3, free_energy=True)
    np.testing.assert_allclose(float(r1.posteriors["mu"].mean()),
                               float(r2.posteriors["mu"].mean()), rtol=1e-6)
    np.testing.assert_allclose(float(r1.posteriors["mu"].var()),
                               float(r2.posteriors["mu"].var()), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(r1.free_energy),
                               np.asarray(r2.free_energy), rtol=1e-5)


def test_grid_beta_bernoulli_three_axes():
    """Three nested plates with a conjugate Beta prior: the posterior counts
    every grid cell."""
    rng = np.random.default_rng(4)
    A, B, C = 4, 5, 6
    y = (rng.random((A, B, C)) < 0.3).astype(np.float32)

    @rx.model
    def cube(y):
        theta = rx.Beta(1.0, 1.0)
        for a in rx.plate(A):
            for b in rx.plate(B):
                for c in rx.plate(C):
                    y[a, b, c] = rx.Bernoulli(theta)
        return {"theta": theta}

    res = rx.infer(returnvars=rx.KeepLast(), model=cube, data={"y": y}, iterations=1)
    h = float(y.sum())
    n = A * B * C
    exact = (1.0 + h) / (2.0 + n)
    np.testing.assert_allclose(float(res.posteriors["theta"].mean()), exact,
                               rtol=1e-5)


def test_grid_latent_not_supported_error():
    @rx.model
    def bad(y):
        tau = rx.Gamma(shape=1.0, rate=1.0)
        for i in rx.plate(3):
            for j in rx.plate(4):
                z = rx.Normal(mean=0.0, var=1.0)
                y[i, j] = rx.Normal(mean=z, precision=tau)

    y = np.zeros((3, 4), np.float32)
    try:
        rx.infer(returnvars=rx.KeepLast(), model=bad, data={"y": y}, iterations=1)
        raise AssertionError("expected NotImplementedError")
    except NotImplementedError as e:
        assert "LATENT" in str(e) or "latent" in str(e)
