"""Grid-shaped latent arrays (nested plates with unobserved outputs) —
reference: multi-dimensional randomvar arrays / x[i, j] indexing in @model."""

import numpy as np
from scipy.stats import norm

import rxinfer_tpu as rx
from rxinfer_tpu.dists import GammaShapeRate


def test_grid_latent_exact_posterior_and_evidence():
    """z[i,j] ~ N(0, v0); y[i,j] ~ N(z[i,j], vy): per-slot conjugate posterior
    and FE == -log Z (tree)."""
    rng = np.random.default_rng(0)
    N, M = 9, 6
    v0, vy = 4.0, 1.0
    y = rng.standard_normal((N, M)).astype(np.float32)

    @rx.model
    def m(y):
        z = rx.latent((N, M), name="z")
        for i in rx.plate(N):
            for j in rx.plate(M):
                z[i, j] = rx.Normal(mean=0.0, var=v0)
                y[i, j] = rx.Normal(mean=z[i, j], var=vy)
        return {"z": z}

    res = rx.infer(returnvars=rx.KeepLast(), model=m, data={"y": y}, iterations=4, free_energy=True)
    zm = np.asarray(res.posteriors["z"].mean())
    zv = np.asarray(res.posteriors["z"].var())
    assert zm.shape == (N, M)
    np.testing.assert_allclose(zm, y * v0 / (v0 + vy), rtol=1e-5)
    np.testing.assert_allclose(zv, np.full((N, M), v0 * vy / (v0 + vy)),
                               rtol=1e-5)
    log_z = norm.logpdf(y, 0.0, np.sqrt(v0 + vy)).sum()
    np.testing.assert_allclose(-float(res.free_energy[-1]), log_z, rtol=1e-5)


def test_grid_latent_hierarchical_row_means():
    """z[i,j] ~ N(mu[i], 1); y[i,j] ~ N(z[i,j], tau^-1) — two-level hierarchy
    with a latent grid in the middle."""
    rng = np.random.default_rng(1)
    N, M = 5, 120
    mu_true = np.linspace(-2, 2, N).astype(np.float32)
    z_true = mu_true[:, None] + rng.standard_normal((N, M)).astype(np.float32)
    y = (z_true + 0.3 * rng.standard_normal((N, M))).astype(np.float32)

    @rx.model
    def m(y):
        tau = rx.Gamma(shape=1.0, rate=1.0)
        mu = rx.latent(N, name="mu")
        for i in rx.plate(N):
            mu[i] = rx.Normal(mean=0.0, var=100.0)
        z = rx.latent((N, M), name="z")
        for i in rx.plate(N):
            for j in rx.plate(M):
                z[i, j] = rx.Normal(mean=mu[i], precision=1.0)
                y[i, j] = rx.Normal(mean=z[i, j], precision=tau)
        return {"mu": mu, "z": z, "tau": tau}

    res = rx.infer(returnvars=rx.KeepLast(), model=m, data={"y": y}, iterations=30, free_energy=True,
                   initialization={"tau": GammaShapeRate(1.0, 1.0)})
    mu_hat = np.asarray(res.posteriors["mu"].mean())
    np.testing.assert_allclose(mu_hat, mu_true, atol=0.35)
    # z posterior pulled toward observations
    z_hat = np.asarray(res.posteriors["z"].mean())
    assert z_hat.shape == (N, M)
    assert np.corrcoef(z_hat.ravel(), z_true.ravel())[0, 1] > 0.9
    # precision of the observation noise ~ 1/0.09 ≈ 11; loose envelope
    assert 4.0 < float(res.posteriors["tau"].mean()) < 20.0
    fe = np.asarray(res.free_energy)
    assert (np.diff(fe) <= 5e-5 * np.abs(fe[:-1]) + 1e-3).all(), fe  # monotone non-increase (f32 tolerance)


def test_grid_latent_requires_full_index():
    @rx.model
    def bad(y):
        z = rx.latent((3, 4), name="z")
        for i in rx.plate(3):
            for j in rx.plate(4):
                z[i, j] = rx.Normal(mean=0.0, var=1.0)
        for i in rx.plate(3):
            y[i] = rx.Normal(mean=z[i], var=1.0)  # partial index

    y = np.zeros(3, np.float32)
    try:
        rx.infer(returnvars=rx.KeepLast(), model=bad, data={"y": y}, iterations=1)
        raise AssertionError("expected TypeError")
    except TypeError as e:
        assert "indexed" in str(e)


def test_grid_latent_lagged_reference_rejected():
    @rx.model
    def bad(y):
        z = rx.latent((3, 4), name="z")
        for i in rx.plate(3):
            for j in rx.plate(1, 4):
                z[i, j] = rx.Normal(mean=0.0, var=1.0)  # partial plate
        for i in rx.plate(3):
            for j in rx.plate(4):
                y[i, j] = rx.Normal(mean=z[i, j], var=1.0)

    y = np.zeros((3, 4), np.float32)
    try:
        rx.infer(returnvars=rx.KeepLast(), model=bad, data={"y": y}, iterations=1)
        raise AssertionError("expected NotImplementedError")
    except NotImplementedError as e:
        assert "zero-offset" in str(e) or "full plates" in str(e)
