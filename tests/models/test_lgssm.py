"""Multivariate LGSSM conformance (reference: test/models/statespace/mlgssm_test.jl
— 2-D rotation dynamics; asserts posterior means within ±3σ of ground truth,
posdef covariances, FE equal to -log evidence of the exact smoother)."""

import numpy as np
import jax.numpy as jnp

import rxinfer_tpu as rx
from rxinfer_tpu.ops.kalman import (
    ChainParams, chain_log_evidence, sequential_filter,
)


def rotation_lgssm_data(T=200, theta=np.pi / 35, seed=1234):
    """Same generative setup as the reference test (StableRNG seed differs; the
    conformance check is vs an exact oracle on OUR data, which is stronger)."""
    rng = np.random.default_rng(seed)
    A = np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]],
        dtype=np.float32,
    )
    Q = np.eye(2, dtype=np.float32)
    B = 1.3 * np.eye(2, dtype=np.float32)
    R = np.eye(2, dtype=np.float32)
    x = np.zeros((T, 2), dtype=np.float32)
    y = np.zeros((T, 2), dtype=np.float32)
    x_prev = np.zeros(2, dtype=np.float32)
    for t in range(T):
        x[t] = A @ x_prev + rng.multivariate_normal(np.zeros(2), Q)
        y[t] = B @ x[t] + rng.multivariate_normal(np.zeros(2), R)
        x_prev = x[t]
    return A, Q, B, R, x, y


def make_model(A, Q, B, R, m0, V0):
    @rx.model
    def lgssm(y):
        T = len(y)
        x = rx.latent(T, name="x")
        x[0] = rx.MvNormal(mean=m0, cov=V0)
        for t in rx.plate(1, T):
            x[t] = rx.MvNormal(mean=A @ x[t - 1], cov=Q)
        for t in rx.plate(T):
            y[t] = rx.MvNormal(mean=B @ x[t], cov=R)

    return lgssm


def _oracle(A, Q, B, R, m0, V0, y):
    T = y.shape[0]
    F = np.tile(A, (T - 1, 1, 1)).astype(np.float32)
    b = np.zeros((T - 1, 2), np.float32)
    Qs = np.tile(Q, (T - 1, 1, 1)).astype(np.float32)
    H = np.tile(B, (T, 1, 1)).astype(np.float32)
    c = np.zeros((T, 2), np.float32)
    Rs = np.tile(R, (T, 1, 1)).astype(np.float32)
    Rinv = np.linalg.inv(Rs)
    W = np.einsum("tji,tjk,tkl->til", H, Rinv, H)
    xi = np.einsum("tji,tjk,tk->ti", H, Rinv, y - c)
    p = ChainParams(*[jnp.asarray(a) for a in (m0, V0, F, b, Qs, xi, W)])
    fm, fP = sequential_filter(p)
    ll = chain_log_evidence(
        p, fm, fP, jnp.asarray(H), jnp.asarray(c), jnp.asarray(Rs), jnp.asarray(y)
    )
    return float(ll)


def test_lgssm_smoothing_exact():
    A, Q, B, R, x_true, y = rotation_lgssm_data(T=200)
    m0 = np.zeros(2, dtype=np.float32)
    V0 = 25.0 * np.eye(2, dtype=np.float32)
    res = rx.infer(returnvars=rx.KeepLast(), 
        model=make_model(A, Q, B, R, m0, V0),
        data={"y": y},
        iterations=1,
        free_energy=True,
    )
    qx = res.posteriors["x"]
    means = np.asarray(qx.mean())
    covs = np.asarray(qx.cov())
    assert means.shape == (200, 2)

    # ±3σ envelope vs ground truth (reference assertion style)
    sigma = np.sqrt(np.diagonal(covs, axis1=-2, axis2=-1))
    inside = np.abs(means - x_true) <= 3.2 * sigma
    assert inside.mean() > 0.97

    # posdef covariances
    eigs = np.linalg.eigvalsh(covs)
    assert (eigs > 0).all()

    # FE == -log evidence (exact sum-product on a tree)
    ll = _oracle(A, Q, B, R, m0, V0, y)
    fe = float(np.asarray(res.free_energy)[-1])
    assert np.isclose(fe, -ll, rtol=1e-5, atol=0.02), (fe, -ll)


def test_lgssm_matches_oracle_smoother():
    from rxinfer_tpu.ops.kalman import sequential_smoother

    A, Q, B, R, x_true, y = rotation_lgssm_data(T=97, seed=7)
    m0 = np.zeros(2, dtype=np.float32)
    V0 = 25.0 * np.eye(2, dtype=np.float32)
    res = rx.infer(model=make_model(A, Q, B, R, m0, V0), data={"y": y})
    qx = res.posteriors["x"]

    T = y.shape[0]
    F = np.tile(A, (T - 1, 1, 1)).astype(np.float32)
    bb = np.zeros((T - 1, 2), np.float32)
    Qs = np.tile(Q, (T - 1, 1, 1)).astype(np.float32)
    Rinv = np.linalg.inv(R)
    W = np.tile(B.T @ Rinv @ B, (T, 1, 1)).astype(np.float32)
    xi = np.einsum("ji,jk,tk->ti", B, Rinv, y).astype(np.float32)
    p = ChainParams(*[jnp.asarray(a) for a in (m0, V0, F, bb, Qs, xi, W)])
    oracle = sequential_smoother(p)
    np.testing.assert_allclose(qx.mean(), oracle.means, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(qx.cov(), oracle.covs, rtol=1e-3, atol=1e-4)


def test_scalar_lgssm():
    """Univariate random-walk smoothing (reference: univariate LGSSM test)."""
    rng = np.random.default_rng(3)
    T = 120
    x = np.cumsum(rng.standard_normal(T)).astype(np.float32)
    y = (x + rng.standard_normal(T)).astype(np.float32)

    @rx.model
    def rw(y):
        T = len(y)
        x = rx.latent(T, name="x")
        x[0] = rx.Normal(mean=0.0, var=100.0)
        for t in rx.plate(1, T):
            x[t] = rx.Normal(mean=x[t - 1], var=1.0)
        for t in rx.plate(T):
            y[t] = rx.Normal(mean=x[t], var=1.0)

    res = rx.infer(returnvars=rx.KeepLast(), model=rw, data={"y": y}, iterations=1, free_energy=True)
    qx = res.posteriors["x"]
    m = np.asarray(qx.mean())
    s = np.sqrt(np.asarray(qx.var()))
    assert m.shape == (T,)
    assert (np.abs(m - x) <= 3.5 * s + 1e-3).mean() > 0.95
    assert np.isfinite(float(res.free_energy[-1]))


def test_matmul_precision_strict_mode():
    """options={"matmul_precision": "highest"} — the strict-fp32 accuracy
    mode (round-4): on TPU it forces full-fp32 matmul passes instead of the
    default fast path; on CPU it is a no-op, so results must match exactly."""
    A, Q, B, R, _x_true, y = rotation_lgssm_data(T=64)
    m0 = np.zeros(2, dtype=np.float32)
    V0 = 25.0 * np.eye(2, dtype=np.float32)
    kw = dict(model=make_model(A, Q, B, R, m0, V0), data={"y": y},
              returnvars=rx.KeepLast(), free_energy=True)
    res_strict = rx.infer(**kw, options={"matmul_precision": "highest"})
    res_fast = rx.infer(**kw)
    np.testing.assert_allclose(
        np.asarray(res_strict.posteriors["x"].mean()),
        np.asarray(res_fast.posteriors["x"].mean()), rtol=1e-5)
