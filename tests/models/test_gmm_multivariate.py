"""Multivariate Gaussian mixture model (reference:
test/models/mixtures/gmm_multivariate_tests.jl — NormalMixture with MvNormal
component means and Wishart component precisions)."""

import numpy as np

import rxinfer_tpu as rx
from rxinfer_tpu.dists import (
    Dirichlet,
    MvNormalMeanCovariance,
    Wishart,
)


def _simulate(n, seed=0):
    rng = np.random.default_rng(seed)
    mu0 = np.array([-3.0, -3.0])
    mu1 = np.array([3.0, 2.0])
    cov0 = np.array([[0.5, 0.1], [0.1, 0.4]])
    cov1 = np.array([[0.6, -0.15], [-0.15, 0.3]])
    comp = rng.uniform(size=n) < 0.45
    y = np.where(
        comp[:, None],
        rng.multivariate_normal(mu1, cov1, size=n),
        rng.multivariate_normal(mu0, cov0, size=n),
    ).astype(np.float32)
    return y, comp


def make_model():
    @rx.model
    def mv_gmm(y):
        n = len(y)
        pi = rx.Dirichlet(np.ones(2, dtype=np.float32))
        m0 = rx.MvNormal(mean=np.array([-1.0, -1.0], np.float32),
                         cov=1e2 * np.eye(2, dtype=np.float32))
        m1 = rx.MvNormal(mean=np.array([1.0, 1.0], np.float32),
                         cov=1e2 * np.eye(2, dtype=np.float32))
        w0 = rx.Wishart(3.0, 1e1 * np.eye(2, dtype=np.float32))
        w1 = rx.Wishart(3.0, 1e1 * np.eye(2, dtype=np.float32))
        z = rx.latent(n, name="z")
        for i in rx.plate(n):
            z[i] = rx.Categorical(pi)
            y[i] = rx.NormalMixture(z[i], (m0, m1), (w0, w1))
        return {"pi": pi, "m0": m0, "m1": m1, "w0": w0, "w1": w1, "z": z}

    return mv_gmm


def test_mv_gmm_separates_clusters():
    y, comp = _simulate(300, seed=7)
    init = {
        "m0": MvNormalMeanCovariance(np.array([-1.0, -1.0], np.float32),
                                     10.0 * np.eye(2, dtype=np.float32)),
        "m1": MvNormalMeanCovariance(np.array([1.0, 1.0], np.float32),
                                     10.0 * np.eye(2, dtype=np.float32)),
        "w0": Wishart(np.float32(3.0), np.eye(2, dtype=np.float32)),
        "w1": Wishart(np.float32(3.0), np.eye(2, dtype=np.float32)),
        "pi": Dirichlet(np.ones(2, dtype=np.float32)),
    }
    res = rx.infer(returnvars=rx.KeepLast(), model=make_model(), data={"y": y}, iterations=30,
                   initialization=init, free_energy=True)
    m_hat = sorted(
        [np.asarray(res.posteriors["m0"].mean()),
         np.asarray(res.posteriors["m1"].mean())],
        key=lambda m: m[0],
    )
    np.testing.assert_allclose(m_hat[0], [-3.0, -3.0], atol=0.4)
    np.testing.assert_allclose(m_hat[1], [3.0, 2.0], atol=0.4)
    # mixture weight ≈ 0.45/0.55
    piw = np.sort(np.asarray(res.posteriors["pi"].mean()))
    assert abs(piw[0] - 0.45) < 0.08
    # component precisions: E[W] ≈ inv(cov): diag terms of inv(cov0) ≈ [2.1, 2.6]
    w_means = [np.asarray(res.posteriors[w].mean()) for w in ("w0", "w1")]
    for wm in w_means:
        assert np.all(np.linalg.eigvalsh(wm) > 0.3)
    # FE decreases
    fe = np.asarray(res.free_energy)
    assert (np.diff(fe) <= 5e-5 * np.abs(fe[:-1]) + 1e-3).all(), fe  # monotone non-increase (f32 tolerance)
    # assignments match ground truth up to label swap
    z_hat = np.asarray(res.posteriors["z"].mean()).argmax(-1)
    acc = max((z_hat == comp).mean(), (z_hat == ~comp).mean())
    assert acc > 0.95
