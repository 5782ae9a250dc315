"""rx.infer(mesh=Mesh(..., ("time",))) — ENGINE-reachable time-blocked
smoothing (round-4 mandate: SURVEY §2.3 strategy 3 through the product
surface, not just the ops-level parallel/time_blocked.py library).

A single long Gaussian chain inferred under a time mesh must match the
single-device result to float tolerance — the distributed associative scan is
the same algebra, blocked."""

import numpy as np
import pytest
import jax
from jax.sharding import Mesh

import rxinfer_tpu as rx


def _mesh():
    return Mesh(np.asarray(jax.devices()[:8]), ("time",))


def _lgssm_data(T, seed=0):
    rng = np.random.default_rng(seed)
    th = np.pi / 40
    A = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]],
                 np.float32)
    x = np.zeros((T, 2), np.float32)
    y = np.zeros((T, 2), np.float32)
    xp = np.zeros(2, np.float32)
    for t in range(T):
        x[t] = A @ xp + rng.standard_normal(2)
        y[t] = x[t] + 0.7 * rng.standard_normal(2)
        xp = x[t]
    return A, y


def _lgssm_model(A):
    @rx.model
    def m(y):
        T = len(y)
        x = rx.latent(T, name="x")
        x[0] = rx.MvNormal(mean=np.zeros(2, np.float32),
                           cov=25.0 * np.eye(2, dtype=np.float32))
        for t in rx.plate(1, T):
            x[t] = rx.MvNormal(mean=A @ x[t - 1],
                               cov=np.eye(2, dtype=np.float32))
        for t in rx.plate(T):
            y[t] = rx.MvNormal(mean=x[t],
                               cov=0.49 * np.eye(2, dtype=np.float32))

    return m


def test_time_sharded_lgssm_matches_single_device():
    A, y = _lgssm_data(T=512)
    model = _lgssm_model(A)
    ref = rx.infer(model=model, data={"y": y}, free_energy=True,
                   returnvars=rx.KeepLast())
    res = rx.infer(model=model, data={"y": y}, free_energy=True,
                   returnvars=rx.KeepLast(), mesh=_mesh())
    m_ref = np.asarray(ref.posteriors["x"].mean())
    m_sh = np.asarray(res.posteriors["x"].mean())
    c_ref = np.asarray(ref.posteriors["x"].cov())
    c_sh = np.asarray(res.posteriors["x"].cov())
    np.testing.assert_allclose(m_sh, m_ref, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(c_sh, c_ref, rtol=2e-3, atol=2e-3)
    assert float(np.asarray(res.free_energy)[-1]) == pytest.approx(
        float(np.asarray(ref.free_energy)[-1]), rel=1e-4)


def test_time_sharded_vmp_iterations():
    """Unknown process noise: the chain block runs inside the lax.scan
    iteration loop — shard_map in the scan body must compile and match."""
    rng = np.random.default_rng(1)
    T = 256
    x = np.cumsum(0.5 * rng.standard_normal(T)).astype(np.float32)
    y = (x + 0.3 * rng.standard_normal(T)).astype(np.float32)

    @rx.model
    def walk(y):
        T = len(y)
        tau = rx.Gamma(shape=1.0, rate=1.0)
        x = rx.latent(T, name="x")
        x[0] = rx.Normal(mean=0.0, var=100.0)
        for t in rx.plate(1, T):
            x[t] = rx.Normal(mean=x[t - 1], var=0.25)
        for t in rx.plate(T):
            y[t] = rx.Normal(mean=x[t], precision=tau)
        return {"x": x, "tau": tau}

    kw = dict(model=walk, data={"y": y}, iterations=8, free_energy=True,
              returnvars=rx.KeepLast(),
              initialization={"tau": rx.dists.GammaShapeRate(1.0, 1.0)})
    ref = rx.infer(**kw)
    res = rx.infer(**kw, mesh=_mesh())
    np.testing.assert_allclose(
        np.asarray(res.posteriors["x"].mean()),
        np.asarray(ref.posteriors["x"].mean()), rtol=2e-3, atol=2e-3)
    assert float(res.posteriors["tau"].mean()) == pytest.approx(
        float(ref.posteriors["tau"].mean()), rel=1e-3)
    np.testing.assert_allclose(np.asarray(res.free_energy),
                               np.asarray(ref.free_energy), rtol=1e-3)


def test_time_mesh_requires_eligible_chain():
    @rx.model
    def iid(y):
        mu = rx.Normal(mean=0.0, var=10.0)
        for t in rx.plate(len(y)):
            y[t] = rx.Normal(mean=mu, var=1.0)

    with pytest.raises(ValueError, match="no chain"):
        rx.infer(model=iid, data={"y": np.zeros(16, np.float32)},
                 mesh=_mesh())


def test_time_mesh_indivisible_pads_and_matches():
    """Round-5 (verdict weak item 3): an indivisible chain length no longer
    falls back or raises — the tail pads with identity transitions and
    zero-precision evidence (the zero natural vector is the identity) and
    results match the single-device run exactly on t < T."""
    A, y = _lgssm_data(T=100)  # 100 % 8 != 0
    model = _lgssm_model(A)
    ref = rx.infer(model=model, data={"y": y}, free_energy=True,
                   returnvars=rx.KeepLast())
    with pytest.warns(UserWarning, match="padded"):
        res = rx.infer(model=model, data={"y": y}, free_energy=True,
                       returnvars=rx.KeepLast(), mesh=_mesh())
    np.testing.assert_allclose(
        np.asarray(res.posteriors["x"].mean()),
        np.asarray(ref.posteriors["x"].mean()), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(res.posteriors["x"].cov()),
        np.asarray(ref.posteriors["x"].cov()), rtol=2e-3, atol=2e-3)
    assert float(np.asarray(res.free_energy)[-1]) == pytest.approx(
        float(np.asarray(ref.free_energy)[-1]), rel=1e-4)
