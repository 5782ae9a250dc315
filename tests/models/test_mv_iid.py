"""Multivariate IID conformance — the reference's 4 variants
(test/models/iid/mv_iid_*.jl): precision/covariance form × known/unknown mean."""

import numpy as np

import rxinfer_tpu as rx
from rxinfer_tpu.dists import (
    InverseWishart,
    MvNormalMeanCovariance,
    Wishart,
)

D = 3


def _data(n=400, seed=0):
    rng = np.random.default_rng(seed)
    mean_true = np.array([1.0, -0.5, 2.0], dtype=np.float64)
    a = rng.standard_normal((D, D))
    cov_true = 0.5 * (a @ a.T) + np.eye(D)
    y = rng.multivariate_normal(mean_true, cov_true, size=n).astype(np.float32)
    return mean_true, cov_true, y


def test_known_mean_unknown_precision_wishart():
    mean_true, cov_true, y = _data()
    n = len(y)

    @rx.model
    def m(y):
        w = rx.Wishart(float(D) + 1.0, np.float32(np.eye(D)))
        for i in rx.plate(n):
            y[i] = rx.MvNormal(mean=mean_true.astype(np.float32), precision=w)
        return {"w": w}

    res = rx.infer(returnvars=rx.KeepLast(), model=m, data={"y": y}, iterations=5, free_energy=True)
    q = res.posteriors["w"]
    # posterior Wishart: nu = nu0 + n; E[W] should approximate inv(cov_true)
    assert np.isclose(float(q.nu), D + 1.0 + n, atol=1e-2)
    e_w = np.asarray(q.nu * q.s)
    np.testing.assert_allclose(e_w, np.linalg.inv(cov_true), rtol=0.25, atol=0.12)
    fe = np.asarray(res.free_energy)
    assert np.isfinite(fe).all()
    assert (fe[1:] - fe[:-1] <= 5e-5 * np.abs(fe[:-1])).all()


def test_known_mean_unknown_covariance_inverse_wishart():
    mean_true, cov_true, y = _data(seed=1)
    n = len(y)

    @rx.model
    def m(y):
        v = rx.InverseWishart(float(D) + 3.0, np.float32(np.eye(D)))
        for i in rx.plate(n):
            y[i] = rx.MvNormal(mean=mean_true.astype(np.float32), cov=v)
        return {"v": v}

    res = rx.infer(returnvars=rx.KeepLast(), model=m, data={"y": y}, iterations=5, free_energy=True)
    q = res.posteriors["v"]
    assert np.isclose(float(q.nu), D + 3.0 + n, atol=1e-2)
    np.testing.assert_allclose(np.asarray(q.mean()), cov_true, rtol=0.25, atol=0.15)


def test_unknown_mean_known_precision():
    mean_true, cov_true, y = _data(seed=2)
    n = len(y)
    w_known = np.linalg.inv(cov_true).astype(np.float32)

    @rx.model
    def m(y):
        mu = rx.MvNormal(mean=np.zeros(D, np.float32),
                         cov=100.0 * np.eye(D, dtype=np.float32))
        for i in rx.plate(n):
            y[i] = rx.MvNormal(mean=mu, precision=w_known)
        return {"mu": mu}

    res = rx.infer(returnvars=rx.KeepLast(), model=m, data={"y": y}, iterations=1, free_energy=True)
    q = res.posteriors["mu"]
    # exact conjugate posterior
    w_post = np.eye(D) / 100.0 + n * w_known
    m_post = np.linalg.solve(w_post, w_known @ y.sum(0))
    np.testing.assert_allclose(np.asarray(q.mean()), m_post, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(q.precision()), w_post, rtol=1e-2)


def test_unknown_mean_and_precision():
    mean_true, cov_true, y = _data(seed=3)
    n = len(y)

    @rx.model
    def m(y):
        mu = rx.MvNormal(mean=np.zeros(D, np.float32),
                         cov=100.0 * np.eye(D, dtype=np.float32))
        w = rx.Wishart(float(D) + 1.0, np.float32(np.eye(D)))
        for i in rx.plate(n):
            y[i] = rx.MvNormal(mean=mu, precision=w)
        return {"mu": mu, "w": w}

    res = rx.infer(returnvars=rx.KeepLast(), 
        model=m, data={"y": y}, iterations=20,
        initialization={"w": Wishart(float(D) + 1.0, np.float32(np.eye(D)))},
        free_energy=True,
    )
    np.testing.assert_allclose(
        np.asarray(res.posteriors["mu"].mean()), y.mean(0), rtol=1e-2, atol=2e-2
    )
    e_w = np.asarray(res.posteriors["w"].nu * res.posteriors["w"].s)
    np.testing.assert_allclose(e_w, np.linalg.inv(cov_true), rtol=0.3, atol=0.15)
    fe = np.asarray(res.free_energy)
    assert (fe[1:] - fe[:-1] <= 5e-5 * np.abs(fe[:-1])).all()
