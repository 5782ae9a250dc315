"""Gaussian mixture model clustering via VMP (reference: univariate GMM test +
BASELINE.json config 4)."""

import numpy as np

import rxinfer_tpu as rx
from rxinfer_tpu.dists import Dirichlet, GammaShapeRate, NormalMeanVariance


def make_model(k=2):
    @rx.model
    def gmm(y):
        n = len(y)
        pi = rx.Dirichlet(np.ones(k, dtype=np.float32))
        m0 = rx.Normal(mean=-2.0, var=100.0)
        m1 = rx.Normal(mean=2.0, var=100.0)
        w0 = rx.Gamma(shape=0.01, rate=0.01)
        w1 = rx.Gamma(shape=0.01, rate=0.01)
        z = rx.latent(n, name="z")
        for i in rx.plate(n):
            z[i] = rx.Categorical(pi)
            y[i] = rx.NormalMixture(z[i], (m0, m1), (w0, w1))
        return {"pi": pi, "m0": m0, "m1": m1, "w0": w0, "w1": w1}

    return gmm


def test_gmm_separates_clusters():
    rng = np.random.default_rng(5)
    n = 400
    comp = rng.uniform(size=n) < 0.4
    y = np.where(comp, 4.0 + 0.5 * rng.standard_normal(n),
                 -1.0 + 0.7 * rng.standard_normal(n)).astype(np.float32)
    init = {
        "m0": NormalMeanVariance(-2.0, 10.0),
        "m1": NormalMeanVariance(2.0, 10.0),
        "w0": GammaShapeRate(1.0, 1.0),
        "w1": GammaShapeRate(1.0, 1.0),
        "pi": Dirichlet(np.ones(2, dtype=np.float32)),
    }
    res = rx.infer(returnvars=rx.KeepLast(), 
        model=make_model(), data={"y": y}, iterations=30,
        initialization=init, free_energy=True,
    )
    means = sorted([float(res.posteriors["m0"].mean()), float(res.posteriors["m1"].mean())])
    assert abs(means[0] - (-1.0)) < 0.3
    assert abs(means[1] - 4.0) < 0.3

    # mixture weights ≈ 0.6 / 0.4
    piw = np.sort(np.asarray(res.posteriors["pi"].mean()))
    assert abs(piw[0] - 0.4) < 0.07

    # component precisions roughly correct (1/0.49 ≈ 2.0 and 1/0.25 = 4.0)
    precs = sorted(
        float(res.posteriors[w].mean()) for w in ("w0", "w1")
    )
    assert 1.0 < precs[0] < 3.5
    assert 2.5 < precs[1] < 6.5

    # FE decreasing
    fe = np.asarray(res.free_energy)
    assert (fe[1:] - fe[:-1] <= 1e-2).all()

    # responsibilities assign correctly
    z = np.asarray(res.posteriors["z"].mean())
    hard = z.argmax(-1)
    # cluster with larger mean should match `comp`
    hi_comp = hard == np.argmax(
        [float(res.posteriors["m0"].mean()), float(res.posteriors["m1"].mean())]
    )
    assert (hi_comp == comp).mean() > 0.95
