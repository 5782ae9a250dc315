"""Kalman scan ops vs an independent numpy reference implementation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rxinfer_tpu.ops.kalman import (
    ChainParams,
    chain_log_evidence,
    filter_step,
    parallel_filter,
    parallel_smoother,
    sequential_filter,
    sequential_smoother,
)


def _np_kalman(m0, P0, F, b, Q, H, c, R, y):
    """Plain numpy Kalman filter + RTS smoother + loglik (independent oracle)."""
    T, dy = y.shape
    d = m0.shape[0]
    fm = np.zeros((T, d)); fP = np.zeros((T, d, d))
    ll = 0.0
    m_pred, P_pred = m0.copy(), P0.copy()
    for t in range(T):
        if t > 0:
            m_pred = F[t - 1] @ fm[t - 1] + b[t - 1]
            P_pred = F[t - 1] @ fP[t - 1] @ F[t - 1].T + Q[t - 1]
        S = H[t] @ P_pred @ H[t].T + R[t]
        mu = H[t] @ m_pred + c[t]
        diff = y[t] - mu
        ll += -0.5 * (dy * np.log(2 * np.pi) + np.linalg.slogdet(S)[1]
                      + diff @ np.linalg.solve(S, diff))
        K = P_pred @ H[t].T @ np.linalg.inv(S)
        fm[t] = m_pred + K @ diff
        fP[t] = (np.eye(d) - K @ H[t]) @ P_pred
    sm = fm.copy(); sP = fP.copy()
    cross = np.zeros((T - 1, d, d))
    for t in range(T - 2, -1, -1):
        P_pred = F[t] @ fP[t] @ F[t].T + Q[t]
        G = fP[t] @ F[t].T @ np.linalg.inv(P_pred)
        sm[t] = fm[t] + G @ (sm[t + 1] - (F[t] @ fm[t] + b[t]))
        sP[t] = fP[t] + G @ (sP[t + 1] - P_pred) @ G.T
        cross[t] = G @ sP[t + 1]
    return fm, fP, sm, sP, cross, ll


def _random_lgssm(T=25, d=3, dy=2, seed=0):
    rng = np.random.default_rng(seed)
    m0 = rng.standard_normal(d)
    A0 = rng.standard_normal((d, d))
    P0 = A0 @ A0.T + d * np.eye(d)
    F = np.tile((np.eye(d) * 0.9 + 0.05 * rng.standard_normal((d, d))), (T - 1, 1, 1))
    b = 0.1 * rng.standard_normal((T - 1, d))
    Qm = rng.standard_normal((d, d))
    Q = np.tile(0.5 * (Qm @ Qm.T) + np.eye(d), (T - 1, 1, 1))
    H = np.tile(rng.standard_normal((dy, d)), (T, 1, 1))
    c = 0.2 * rng.standard_normal((T, dy))
    Rm = rng.standard_normal((dy, dy))
    R = np.tile(0.5 * (Rm @ Rm.T) + np.eye(dy), (T, 1, 1))
    y = rng.standard_normal((T, dy))
    return (m0, P0, F, b, Q, H, c, R, y)


def _to_info(H, c, R, y):
    """Convert moment-form emissions to per-step information (xi, W)."""
    Rinv = np.linalg.inv(R)
    W = np.einsum("tji,tjk,tkl->til", H, Rinv, H)
    xi = np.einsum("tji,tjk,tk->ti", H, Rinv, y - c)
    return xi, W


def _params(m0, P0, F, b, Q, H, c, R, y):
    xi, W = _to_info(H, c, R, y)
    f32 = lambda a: jnp.asarray(a, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    return ChainParams(f32(m0), f32(P0), f32(F), f32(b), f32(Q), f32(xi), f32(W))


@pytest.mark.parametrize("impl", ["sequential", "parallel"])
def test_filter_matches_numpy(impl):
    args = _random_lgssm()
    p = _params(*args)
    fn = sequential_filter if impl == "sequential" else parallel_filter
    means, covs = jax.jit(fn)(p)
    fm, fP, *_ = _np_kalman(*args)
    np.testing.assert_allclose(means, fm, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(covs, fP, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("impl", ["sequential", "parallel"])
def test_smoother_matches_numpy(impl):
    args = _random_lgssm()
    p = _params(*args)
    fn = sequential_smoother if impl == "sequential" else parallel_smoother
    res = jax.jit(fn)(p)
    fm, fP, sm, sP, cross, ll = _np_kalman(*args)
    np.testing.assert_allclose(res.means, sm, rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(res.covs, sP, rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(res.cross, cross, rtol=5e-3, atol=5e-3)


def test_log_evidence_matches_numpy():
    args = _random_lgssm()
    m0, P0, F, b, Q, H, c, R, y = args
    p = _params(*args)
    fm, fP = sequential_filter(p)
    ll = chain_log_evidence(
        p, fm, fP, jnp.asarray(H, jnp.float32), jnp.asarray(c, jnp.float32),
        jnp.asarray(R, jnp.float32), jnp.asarray(y, jnp.float32)
    )
    *_, ll_np = _np_kalman(*args)
    assert np.isclose(ll, ll_np, rtol=1e-4)


def test_parallel_equals_sequential_long_chain():
    args = _random_lgssm(T=300, d=2, dy=1, seed=3)
    p = _params(*args)
    r_seq = jax.jit(sequential_smoother)(p)
    r_par = jax.jit(parallel_smoother)(p)
    np.testing.assert_allclose(r_par.means, r_seq.means, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(r_par.covs, r_seq.covs, rtol=5e-3, atol=5e-3)


def test_missing_observations_via_zero_information():
    # Steps with W=0 are pure predictions (reference: predictvars / missing data).
    args = _random_lgssm(T=10, d=2, dy=2, seed=5)
    m0, P0, F, b, Q, H, c, R, y = args
    xi, W = _to_info(H, c, R, y)
    xi[4] = 0.0
    W[4] = 0.0
    p = ChainParams(*[jnp.asarray(a, jnp.float32) for a in (m0, P0, F, b, Q, xi, W)])
    means, covs = sequential_filter(p)
    # At t=4 filtered == predicted from t=3
    m_pred = F[3] @ np.asarray(means[3]) + b[3]
    np.testing.assert_allclose(means[4], m_pred, rtol=1e-4, atol=1e-4)


def test_filter_step_batched():
    B, d = 64, 4
    rng = np.random.default_rng(0)
    m = rng.standard_normal((B, d)).astype(np.float32)
    P = np.tile(np.eye(d, dtype=np.float32), (B, 1, 1))
    F = np.tile(0.9 * np.eye(d, dtype=np.float32), (B, 1, 1))
    b = np.zeros((B, d), np.float32)
    Q = np.tile(0.1 * np.eye(d, dtype=np.float32), (B, 1, 1))
    W = np.tile(2.0 * np.eye(d, dtype=np.float32), (B, 1, 1))
    xi = rng.standard_normal((B, d)).astype(np.float32)
    m2, P2 = jax.jit(filter_step)(*map(jnp.asarray, (m, P, F, b, Q, xi, W)))
    assert m2.shape == (B, d) and P2.shape == (B, d, d)
    # cross-check one element against scalar math
    i = 7
    m_pred = F[i] @ m[i]
    P_pred = F[i] @ P[i] @ F[i].T + Q[i]
    W_post = np.linalg.inv(P_pred) + W[i]
    P_new = np.linalg.inv(W_post)
    m_new = P_new @ (np.linalg.solve(P_pred, m_pred) + xi[i])
    np.testing.assert_allclose(m2[i], m_new, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(P2[i], P_new, rtol=1e-4, atol=1e-4)


def test_bf16_payload_smoother_accuracy():
    """bf16 message payloads with fp32 accumulation (BASELINE.json precision
    policy): posterior means within ~1e-2 of the fp32 smoother."""
    import jax.numpy as jnp

    args = _random_lgssm(T=200, d=2, dy=2, seed=9)
    p = _params(*args)
    fp32 = jax.jit(parallel_smoother)(p)
    bf16 = jax.jit(lambda p: parallel_smoother(p, payload_dtype=jnp.bfloat16))(p)
    scale = np.abs(np.asarray(fp32.means)).max()
    assert np.abs(np.asarray(bf16.means) - np.asarray(fp32.means)).max() < 0.05 * scale
    assert np.isfinite(np.asarray(bf16.covs)).all()


@pytest.mark.parametrize("d", [12, 16])
def test_smoother_d16_matches_numpy(d):
    """Round-4 d=16 story: the AoS smoother path (d>8) now runs the
    closed-form Schur inverse tier (ops/smallmat.py 8|rest splits) instead of
    generic LU — correctness vs the float64 numpy oracle."""
    args = _random_lgssm(T=20, d=d, dy=d, seed=4)
    p = _params(*args)
    res = jax.jit(parallel_smoother)(p)
    fm, fP, sm, sP, cross, ll = _np_kalman(*args)
    np.testing.assert_allclose(res.means, sm, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(res.covs, sP, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(res.cross, cross, rtol=1e-2, atol=1e-2)
