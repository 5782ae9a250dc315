"""Missing data + predictions (reference: test/inference/prediction_tests.jl —
predictvars / missing observations)."""

import numpy as np

import rxinfer_tpu as rx
from rxinfer_tpu.ops.kalman import ChainParams, sequential_smoother
import jax.numpy as jnp


def test_lgssm_with_missing_observations():
    rng = np.random.default_rng(0)
    T, d = 60, 2
    theta = np.pi / 15
    A = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]], dtype=np.float32)
    x = np.zeros((T, d), np.float32)
    y = np.zeros((T, d), np.float32)
    xp = np.zeros(d, np.float32)
    for t in range(T):
        xp = A @ xp + rng.standard_normal(d).astype(np.float32)
        x[t] = xp
        y[t] = xp + rng.standard_normal(d).astype(np.float32)
    missing = [10, 11, 12, 30, 45]
    y_obs = y.copy()
    y_obs[missing] = np.nan

    @rx.model
    def lgssm(y):
        xs = rx.latent(T, name="x")
        xs[0] = rx.MvNormal(mean=np.zeros(d, np.float32),
                            cov=25 * np.eye(d, dtype=np.float32))
        for t in rx.plate(1, T):
            xs[t] = rx.MvNormal(mean=A @ xs[t - 1], cov=np.eye(d, dtype=np.float32))
        for t in rx.plate(T):
            y[t] = rx.MvNormal(mean=xs[t], cov=np.eye(d, dtype=np.float32))

    res = rx.infer(returnvars=rx.KeepLast(), model=lgssm, data={"y": y_obs}, iterations=1,
                   free_energy=True, predictvars=["y"])
    qx = res.posteriors["x"]

    # oracle: masked info-form smoother
    Rinv = np.eye(d, dtype=np.float32)
    W = np.tile(Rinv, (T, 1, 1))
    xi = y.copy()
    for t in missing:
        W[t] = 0
        xi[t] = 0
    p = ChainParams(
        jnp.zeros(d), 25 * jnp.eye(d),
        jnp.broadcast_to(jnp.asarray(A), (T - 1, d, d)),
        jnp.zeros((T - 1, d)),
        jnp.broadcast_to(jnp.eye(d), (T - 1, d, d)),
        jnp.asarray(xi), jnp.asarray(W),
    )
    oracle = sequential_smoother(p)
    np.testing.assert_allclose(qx.mean(), oracle.means, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(qx.cov(), oracle.covs, rtol=1e-3, atol=1e-3)

    # predictions at missing slots: mean = smoothed state mean, cov = P + R
    pred = res.predictions["y"]
    np.testing.assert_allclose(
        np.asarray(pred.mean())[missing], np.asarray(oracle.means)[missing],
        rtol=1e-3, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(pred.cov())[missing],
        np.asarray(oracle.covs)[missing] + np.eye(d),
        rtol=1e-3, atol=1e-3,
    )
    assert np.isfinite(float(res.free_energy[-1]))


def test_fe_missing_equals_observed_subset_evidence():
    """FE with NaN slots must equal -logZ computed over observed slots only."""
    rng = np.random.default_rng(1)
    T = 30
    y = np.cumsum(rng.standard_normal(T)).astype(np.float32)
    y_obs = y.copy()
    y_obs[[5, 17]] = np.nan

    @rx.model
    def rw(y):
        xs = rx.latent(T, name="x")
        xs[0] = rx.Normal(mean=0.0, var=50.0)
        for t in rx.plate(1, T):
            xs[t] = rx.Normal(mean=xs[t - 1], var=1.0)
        for t in rx.plate(T):
            y[t] = rx.Normal(mean=xs[t], var=0.5)

    res = rx.infer(returnvars=rx.KeepLast(), model=rw, data={"y": y_obs}, iterations=1, free_energy=True)
    fe = float(res.free_energy[-1])

    # oracle: scalar Kalman filter marginal likelihood over observed slots
    from rxinfer_tpu.ops.kalman import chain_log_evidence, sequential_filter

    W = np.where(np.isnan(y_obs), 0.0, 1 / 0.5).astype(np.float32)[:, None, None]
    xi = np.where(np.isnan(y_obs), 0.0, np.nan_to_num(y_obs) / 0.5).astype(np.float32)[:, None]
    p = ChainParams(
        jnp.zeros(1), 50 * jnp.ones((1, 1)),
        jnp.ones((T - 1, 1, 1)), jnp.zeros((T - 1, 1)), jnp.ones((T - 1, 1, 1)),
        jnp.asarray(xi), jnp.asarray(W),
    )
    fm, fP = sequential_filter(p)
    mask = ~np.isnan(y_obs)
    ll = chain_log_evidence(
        p, fm, fP,
        jnp.ones((T, 1, 1)), jnp.zeros((T, 1)), 0.5 * jnp.ones((T, 1, 1)),
        jnp.nan_to_num(y_obs)[:, None], mask=jnp.asarray(mask),
    )
    assert np.isclose(fe, -float(ll), rtol=1e-4, atol=0.02), (fe, -float(ll))
