"""Chains whose transition is a USER-REGISTERED node: Jacobi fallback.

The reference runs arbitrary nodes inside @model loops through its reactive
scheduler (iterative message passing — no special chain solver exists there
at all).  Here, transitions without an associative-scan chain block fall back
to the generic PlainGroup machinery: every (factor, interface) adjacency pair
messages the variable — including BOTH touches of a lagged transition
(out = x[t], in = x[t-1]) — so with a cavity cluster declared the fixed point
is exact BP smoothing on trees."""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest

import rxinfer_tpu as rx
from rxinfer_tpu.dists import NormalMeanVariance
from rxinfer_tpu.rules import node

DRIFT, QVAR = 0.5, 0.3


@node("DriftWalkT")
class DriftWalkT:
    """out ~ N(in + DRIFT, QVAR) — a custom Gaussian transition."""

    interfaces = ("out", "in")
    cavity_cluster = ("out", "in")  # BP on the chain pair -> exact on trees

    @staticmethod
    def message_to_out(q):
        m = q["in"]
        return NormalMeanVariance(m.mean() + DRIFT, m.var() + QVAR)

    @staticmethod
    def message_to_in(q):
        m = q["out"]
        return NormalMeanVariance(m.mean() - DRIFT, m.var() + QVAR)

    @staticmethod
    def average_energy(q):
        mo, vo = q["out"].mean(), q["out"].var()
        mi, vi = q["in"].mean(), q["in"].var()
        return 0.5 * (jnp.log(2 * jnp.pi * QVAR)
                      + ((mo - mi - DRIFT) ** 2 + vo + vi) / QVAR)


def _data(T=20, seed=0):
    rng = np.random.default_rng(seed)
    x_true = np.cumsum(DRIFT + np.sqrt(QVAR) * rng.standard_normal(T))
    y = (x_true + 0.2 * rng.standard_normal(T)).astype(np.float32)
    return x_true, y


def _custom_model(T):
    @rx.model
    def m(y):
        x = rx.latent(T, name="x")
        x[0] = rx.Normal(mean=DRIFT, var=0.4)
        for t in rx.plate(1, T):
            x[t] = rx.factor_node("DriftWalkT", **{"in": x[t - 1]})
        for t in rx.plate(T):
            y[t] = rx.Normal(mean=x[t], var=0.04)
        return {"x": x}

    return m


def _builtin_model(T):
    @rx.model
    def m(y):
        x = rx.latent(T, name="x")
        x[0] = rx.Normal(mean=DRIFT, var=0.4)
        for t in rx.plate(1, T):
            x[t] = rx.Normal(mean=x[t - 1] + DRIFT, var=QVAR)
        for t in rx.plate(T):
            y[t] = rx.Normal(mean=x[t], var=0.04)
        return {"x": x}

    return m


def test_custom_transition_warns_and_matches_exact_smoother():
    T = 20
    x_true, y = _data(T)
    with pytest.warns(UserWarning, match="no associative-scan chain solver"):
        res = rx.infer(
            model=_custom_model(T), data={"y": y}, iterations=80,
            free_energy=True, returnvars=rx.KeepLast(),
            initialization={"x": NormalMeanVariance(0.0, 10.0)},
        )
    ref = rx.infer(model=_builtin_model(T), data={"y": y}, iterations=1,
                   returnvars=rx.KeepLast(), free_energy=True)
    np.testing.assert_allclose(
        np.asarray(res.posteriors["x"].mean()),
        np.asarray(ref.posteriors["x"].mean()), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(res.posteriors["x"].var()),
        np.asarray(ref.posteriors["x"].var()), atol=1e-4)
    # STRUCTURED pair FE (round-4): the affine-Gaussian probe reconstructs
    # the exact pair joint from cavity messages, so at the Jacobi fixed point
    # FE == −log Z — the builtin chain block's FE is the oracle (its own
    # FE==−logZ is asserted against the Kalman evidence in test_lgssm).
    fe = np.asarray(res.free_energy)
    assert np.all(np.isfinite(fe))
    fe_ref = float(np.asarray(ref.free_energy)[-1])
    assert abs(fe[-1] - fe_ref) < 5e-4, (fe[-1], fe_ref)
    # ... and both equal the Kalman prediction-error −log Z oracle
    from rxinfer_tpu.ops.kalman import (
        ChainParams, chain_log_evidence, sequential_filter,
    )

    F = np.ones((T - 1, 1, 1), np.float32)
    b = np.full((T - 1, 1), DRIFT, np.float32)
    Q = np.full((T - 1, 1, 1), QVAR, np.float32)
    H = np.ones((T, 1, 1), np.float32)
    R = np.full((T, 1, 1), 0.04, np.float32)
    p = ChainParams(
        jnp.asarray([DRIFT], jnp.float32), jnp.asarray([[0.4]], jnp.float32),
        jnp.asarray(F), jnp.asarray(b), jnp.asarray(Q),
        jnp.asarray(y[:, None] / 0.04), jnp.asarray(H / 0.04),
    )
    fm, fc = sequential_filter(p)
    ll = chain_log_evidence(p, fm, fc, jnp.asarray(H),
                            jnp.zeros((T, 1), np.float32), jnp.asarray(R),
                            jnp.asarray(y[:, None]))
    assert abs(fe[-1] - (-float(ll))) < 5e-4, (fe[-1], -float(ll))


def test_custom_transition_auto_vague_init():
    """Without initialization= the self-dependent group is vague-initialized
    automatically (the engine's auto-init, mirroring vague(T)); inference
    still converges to the exact smoother."""
    T = 10
    _, y = _data(T, seed=1)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        res = rx.infer(model=_custom_model(T), data={"y": y}, iterations=60,
                       returnvars=rx.KeepLast())
    ref = rx.infer(model=_builtin_model(T), data={"y": y}, iterations=1,
                   returnvars=rx.KeepLast())
    np.testing.assert_allclose(
        np.asarray(res.posteriors["x"].mean()),
        np.asarray(ref.posteriors["x"].mean()), atol=1e-3)


# --- round-5: multivariate custom transitions (vector-state affine probe) ---

A_MV = np.array([[0.95, -0.2], [0.2, 0.95]], np.float32)
B_MV = np.array([0.3, -0.1], np.float32)
Q_MV = np.array([[0.3, 0.05], [0.05, 0.2]], np.float32)
R_MV = 0.04 * np.eye(2, dtype=np.float32)


@node("MvDriftWalkT")
class MvDriftWalkT:
    """out ~ N(A·in + b, Q) — a custom MULTIVARIATE Gaussian transition."""

    interfaces = ("out", "in")
    cavity_cluster = ("out", "in")

    @staticmethod
    def message_to_out(q):
        # rules receive PLATE-BATCHED marginals (leading copies axis):
        # write them batch-polymorphic with einsum
        from rxinfer_tpu.dists import MvNormalMeanCovariance

        m = q["in"]
        A, b, Q = jnp.asarray(A_MV), jnp.asarray(B_MV), jnp.asarray(Q_MV)
        return MvNormalMeanCovariance(
            jnp.einsum("ij,...j->...i", A, m.mean()) + b,
            jnp.einsum("ij,...jk,lk->...il", A, m.cov(), A) + Q)

    @staticmethod
    def message_to_in(q):
        from rxinfer_tpu.dists import MvNormalMeanCovariance

        m = q["out"]
        A, b, Q = jnp.asarray(A_MV), jnp.asarray(B_MV), jnp.asarray(Q_MV)
        Ainv = jnp.linalg.inv(A)
        return MvNormalMeanCovariance(
            jnp.einsum("ij,...j->...i", Ainv, m.mean() - b),
            jnp.einsum("ij,...jk,lk->...il", Ainv, m.cov() + Q, Ainv))

    @staticmethod
    def average_energy(q):
        A, b, Q = jnp.asarray(A_MV), jnp.asarray(B_MV), jnp.asarray(Q_MV)
        Qinv = jnp.linalg.inv(Q)
        mo, vo = q["out"].mean(), q["out"].cov()
        mi, vi = q["in"].mean(), q["in"].cov()
        resid = mo - jnp.einsum("ij,...j->...i", A, mi) - b
        c2 = (vo + jnp.einsum("ik,...kl,jl->...ij", A, vi, A)
              + resid[..., :, None] * resid[..., None, :])
        return 0.5 * (2 * jnp.log(2 * jnp.pi)
                      + jnp.linalg.slogdet(Q)[1]
                      + jnp.einsum("ij,...ji->...", Qinv, c2))


def _mv_data(T=16, seed=1):
    rng = np.random.default_rng(seed)
    x = np.zeros(2)
    ys = []
    for _ in range(T):
        x = A_MV @ x + B_MV + np.linalg.cholesky(Q_MV) @ rng.standard_normal(2)
        ys.append(x + 0.2 * rng.standard_normal(2))
    return np.asarray(ys, np.float32)


def test_mv_custom_transition_structured_fe_matches_builtin():
    """Vector-state custom transition: posterior == builtin chain block and
    FE == −log Z (the builtin structured chain FE is the oracle) — the
    round-5 multivariate affine probe (engine/bethe.py
    _extract_affine_transition)."""
    from rxinfer_tpu.dists import MvNormalMeanCovariance

    T = 16
    y = _mv_data(T)
    P0 = 0.4 * np.eye(2, dtype=np.float32)

    @rx.model
    def custom(y):
        x = rx.latent(T, name="x")
        x[0] = rx.MvNormal(mean=B_MV, cov=P0)
        for t in rx.plate(1, T):
            x[t] = rx.factor_node("MvDriftWalkT", **{"in": x[t - 1]})
        for t in rx.plate(T):
            y[t] = rx.MvNormal(mean=x[t], cov=R_MV)
        return {"x": x}

    @rx.model
    def builtin(y):
        x = rx.latent(T, name="x")
        x[0] = rx.MvNormal(mean=B_MV, cov=P0)
        for t in rx.plate(1, T):
            x[t] = rx.MvNormal(mean=A_MV @ x[t - 1] + B_MV, cov=Q_MV)
        for t in rx.plate(T):
            y[t] = rx.MvNormal(mean=x[t], cov=R_MV)
        return {"x": x}

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        res = rx.infer(
            model=custom, data={"y": y}, iterations=120,
            free_energy=True, returnvars=rx.KeepLast(),
            initialization={"x": MvNormalMeanCovariance(
                np.zeros(2, np.float32), 10.0 * np.eye(2, dtype=np.float32))},
        )
    ref = rx.infer(model=builtin, data={"y": y}, iterations=1,
                   returnvars=rx.KeepLast(), free_energy=True)
    np.testing.assert_allclose(
        np.asarray(res.posteriors["x"].mean()),
        np.asarray(ref.posteriors["x"].mean()), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(res.posteriors["x"].cov()),
        np.asarray(ref.posteriors["x"].cov()), atol=2e-4)
    fe = np.asarray(res.free_energy)
    assert np.all(np.isfinite(fe))
    fe_ref = float(np.asarray(ref.free_energy)[-1])
    assert abs(fe[-1] - fe_ref) < 2e-3, (fe[-1], fe_ref)
