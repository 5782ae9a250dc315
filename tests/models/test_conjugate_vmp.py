"""Gaussian with unknown mean and precision — closed-form VMP with FE convergence
(reference: BASELINE.json config 2; iid model tests)."""

import numpy as np

import rxinfer_tpu as rx
from rxinfer_tpu.dists import GammaShapeRate, NormalMeanVariance


def make_model():
    @rx.model
    def gauss(y):
        mu = rx.Normal(mean=0.0, var=100.0)
        tau = rx.Gamma(shape=0.01, rate=0.01)
        for i in rx.plate(len(y)):
            y[i] = rx.Normal(mean=mu, precision=tau)
        return {"mu": mu, "tau": tau}

    return gauss


def _manual_vmp(y, iters, a0=0.01, b0=0.01, m0=0.0, v0=100.0, tau_init=(0.01, 0.01)):
    """Independent coordinate-ascent VMP oracle."""
    n = len(y)
    e_tau = tau_init[0] / tau_init[1]
    for _ in range(iters):
        # q(mu)
        w = 1.0 / v0 + n * e_tau
        m = (m0 / v0 + e_tau * y.sum()) / w
        v = 1.0 / w
        # q(tau)
        a = a0 + 0.5 * n
        c = np.sum((y - m) ** 2 + v)
        b = b0 + 0.5 * c
        e_tau = a / b
    return m, v, a, b


def test_unknown_mean_precision_vmp():
    rng = np.random.default_rng(11)
    y = (3.0 + 0.5 * rng.standard_normal(500)).astype(np.float32)
    init = {"tau": GammaShapeRate(0.01, 0.01)}
    res = rx.infer(returnvars=rx.KeepLast(), 
        model=make_model(), data={"y": y}, iterations=20,
        initialization=init, free_energy=True,
    )
    q_mu, q_tau = res.posteriors["mu"], res.posteriors["tau"]
    m, v, a, b = _manual_vmp(y.astype(np.float64), 20)
    assert np.isclose(q_mu.mean(), m, rtol=1e-4)
    assert np.isclose(q_mu.var(), v, rtol=1e-3)
    assert np.isclose(q_tau.a, a, rtol=1e-4)
    assert np.isclose(q_tau.b, b, rtol=1e-3)

    # ground truth within 3 sigma
    assert abs(float(q_mu.mean()) - 3.0) < 3 * np.sqrt(float(q_mu.var())) + 0.05
    assert abs(float(q_tau.a / q_tau.b) - 1 / 0.25) < 1.0

    # FE decreases monotonically (coordinate ascent) and converges
    fe = np.asarray(res.free_energy)
    assert fe.shape == (20,)
    diffs = fe[1:] - fe[:-1]
    assert (diffs <= 1e-3).all(), diffs
    assert abs(fe[-1] - fe[-2]) < 1e-5 * abs(fe[-1]) + 1e-4


def test_auto_vague_initialization():
    """The (mu, tau) coupling is a bipartite tree, so the compiler schedules a
    fwd+bwd sweep with automatic vague initialization instead of erroring
    (reference UX requires explicit @initialization; ours only errors on truly
    loopy graphs — see test_loopy_requires_initialization).  The fixed point
    must match explicit vague init."""
    rng = np.random.default_rng(0)
    y = (1.0 + rng.standard_normal(50)).astype(np.float32)
    res = rx.infer(returnvars=rx.KeepLast(), model=make_model(), data={"y": y}, iterations=20)
    init = {"tau": GammaShapeRate(0.01, 0.01),
            "mu": NormalMeanVariance(0.0, 1.0e6)}
    ref = rx.infer(returnvars=rx.KeepLast(), model=make_model(), data={"y": y}, iterations=20,
                   initialization=init)
    assert np.isclose(float(res.posteriors["mu"].mean()),
                      float(ref.posteriors["mu"].mean()), rtol=1e-4)
    assert np.isclose(float(res.posteriors["tau"].a),
                      float(ref.posteriors["tau"].a), rtol=1e-4)


def test_loopy_requires_initialization():
    """A genuinely loopy (non-tree) uninitialized model still raises the
    reference-style initialization error."""

    @rx.model
    def loopy(y):
        a = rx.Normal(mean=0.0, var=1.0)
        b = rx.Normal(mean=a, var=1.0)
        c = rx.Sum(a, b)
        y.observe(rx.Normal(mean=c, var=1.0))
        return {"a": a, "b": b, "c": c}

    try:
        rx.infer(returnvars=rx.KeepLast(), model=loopy, data={"y": np.asarray(1.0, np.float32)},
                 iterations=2)
        raise AssertionError("expected initialization error")
    except ValueError as e:
        assert "initialization" in str(e).lower()
