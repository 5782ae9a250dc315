"""Probit classification + Gamma mixture + PointMass form constraint
(reference: probit model tests; gamma_mixture_tests.jl with q::PointMass)."""

import numpy as np
from scipy.stats import norm as sp_norm

import rxinfer_tpu as rx
from rxinfer_tpu.dists import GammaShapeRate, NormalMeanVariance, Dirichlet, PointMass


def test_probit_regression():
    rng = np.random.default_rng(4)
    n = 500
    theta_true = 0.8
    y = (rng.uniform(size=n) < sp_norm.cdf(theta_true)).astype(np.float32)

    @rx.model
    def probit(y):
        x = rx.Normal(mean=0.0, var=10.0)
        for i in rx.plate(n):
            y[i] = rx.Probit(x)
        return {"x": x}

    res = rx.infer(returnvars=rx.KeepLast(), 
        model=probit, data={"y": y}, iterations=20,
        initialization={"x": NormalMeanVariance(0.0, 10.0)},
        free_energy=True,
    )
    est = float(res.posteriors["x"].mean())
    # posterior over x should make Phi(x) match the empirical rate
    assert abs(sp_norm.cdf(est) - y.mean()) < 0.03
    fe = np.asarray(res.free_energy)
    assert np.isfinite(fe).all()


def test_gamma_mixture_with_pointmass_constraint():
    rng = np.random.default_rng(5)
    n = 600
    comp = rng.uniform(size=n) < 0.5
    y = np.where(
        comp,
        rng.gamma(shape=9.0, scale=1 / 27.0, size=n),   # mean 1/3
        rng.gamma(shape=60.0, scale=1 / 20.0, size=n),  # mean 3
    ).astype(np.float32)

    @rx.model
    def gmix(y):
        pi = rx.Dirichlet(np.ones(2, dtype=np.float32))
        b0 = rx.Gamma(shape=10.0, rate=3.0)
        b1 = rx.Gamma(shape=10.0, rate=1.0)
        z = rx.latent(n, name="z")
        for i in rx.plate(n):
            z[i] = rx.Categorical(pi)
            y[i] = rx.GammaMixture(z[i], (9.0, 60.0), (b0, b1))
        return {"pi": pi, "b0": b0, "b1": b1}

    res = rx.infer(returnvars=rx.KeepLast(), 
        model=gmix, data={"y": y}, iterations=40,
        initialization={
            "b0": GammaShapeRate(10.0, 3.0),
            "b1": GammaShapeRate(10.0, 1.0),
            "pi": Dirichlet(np.ones(2, dtype=np.float32)),
        },
        free_energy=True,
    )
    # component means a_k / E[b_k]
    m0 = 9.0 / float(res.posteriors["b0"].mean())
    m1 = 60.0 / float(res.posteriors["b1"].mean())
    means = sorted([m0, m1])
    assert abs(means[0] - 1 / 3) < 0.1, means
    assert abs(means[1] - 3.0) < 0.4, means
    fe = np.asarray(res.free_energy)
    assert (fe[1:] - fe[:-1] <= 5e-5 * np.abs(fe[:-1]) + 1e-3).all()

    # with a PointMass form constraint on the rates (reference
    # gamma_mixture_tests.jl:33-41 uses q(...) :: PointMass)
    cs = rx.constraints(forms={"b0": rx.PointMassFormConstraint(),
                               "b1": rx.PointMassFormConstraint()})
    res2 = rx.infer(returnvars=rx.KeepLast(), 
        model=gmix, data={"y": y}, iterations=40, constraints=cs,
        initialization={
            "b0": GammaShapeRate(10.0, 3.0),
            "b1": GammaShapeRate(10.0, 1.0),
            "pi": Dirichlet(np.ones(2, dtype=np.float32)),
        },
    )
    assert isinstance(res2.posteriors["b0"], PointMass)
    m0 = 9.0 / float(res2.posteriors["b0"].mean())
    m1 = 60.0 / float(res2.posteriors["b1"].mean())
    means2 = sorted([m0, m1])
    assert abs(means2[0] - 1 / 3) < 0.1
    assert abs(means2[1] - 3.0) < 0.4
