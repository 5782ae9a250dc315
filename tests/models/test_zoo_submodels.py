"""Model zoo + submodel composition equivalence (reference: flat vs submodel
models give identical marginals, test/models/statespace/mlgssm_test.jl:131-135)."""

import numpy as np

import rxinfer_tpu as rx
from rxinfer_tpu import models as zoo


def test_zoo_models_run():
    rng = np.random.default_rng(0)
    y = (rng.uniform(size=50) < 0.7).astype(np.float32)
    res = rx.infer(model=zoo.beta_bernoulli(2.0, 2.0)(), data={"y": y})
    q = res.posteriors["theta"]
    assert np.isclose(float(q.a), 2 + y.sum())

    theta = np.pi / 20
    A = np.float32([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    Q = np.eye(2, dtype=np.float32)
    gen = zoo.lgssm(A, Q, np.eye(2, dtype=np.float32), np.eye(2, dtype=np.float32),
                    np.zeros(2, np.float32), 10 * np.eye(2, dtype=np.float32))
    yy = rng.standard_normal((40, 2)).astype(np.float32)
    res = rx.infer(model=gen, data={"y": yy}, free_energy=True)
    assert np.isfinite(float(res.free_energy[-1]))


def test_flat_vs_submodel_identical_marginals():
    """A submodel is a plain Python function over the trace — flat and composed
    forms must produce the SAME graph and bit-identical marginals."""
    rng = np.random.default_rng(1)
    T = 30
    y = np.cumsum(rng.standard_normal(T)).astype(np.float32) + \
        0.5 * rng.standard_normal(T).astype(np.float32)

    def emission(y, x, t):  # submodel: observation block
        y[t] = rx.Normal(mean=x[t], var=0.25)

    def random_walk(x, t):  # submodel: transition block
        x[t] = rx.Normal(mean=x[t - 1], var=1.0)

    @rx.model
    def flat(y):
        x = rx.latent(T, name="x")
        x[0] = rx.Normal(mean=0.0, var=25.0)
        for t in rx.plate(1, T):
            x[t] = rx.Normal(mean=x[t - 1], var=1.0)
        for t in rx.plate(T):
            y[t] = rx.Normal(mean=x[t], var=0.25)

    @rx.model
    def composed(y):
        x = rx.latent(T, name="x")
        x[0] = rx.Normal(mean=0.0, var=25.0)
        for t in rx.plate(1, T):
            random_walk(x, t)
        for t in rx.plate(T):
            emission(y, x, t)

    r1 = rx.infer(model=flat, data={"y": y}, free_energy=True)
    r2 = rx.infer(model=composed, data={"y": y}, free_energy=True)
    np.testing.assert_array_equal(
        np.asarray(r1.posteriors["x"].mean()), np.asarray(r2.posteriors["x"].mean())
    )
    assert float(r1.free_energy[-1]) == float(r2.free_energy[-1])


def test_fe_nan_diagnostic():
    rng = np.random.default_rng(0)
    y = rng.standard_normal(10).astype(np.float32)

    gen = zoo.gaussian_unknown_mean_precision()
    from rxinfer_tpu.dists import GammaShapeRate

    # sane run with the diagnostic enabled: no error
    res = rx.infer(returnvars=rx.KeepLast(), model=gen, data={"y": y}, iterations=3, free_energy=True,
                   initialization={"tau": GammaShapeRate(1.0, 1.0)},
                   options={"check_objective": True},
                   callbacks={"after_iteration": lambda ev: None})
    assert np.isfinite(np.asarray(res.free_energy)).all()
