"""log_evidence / model-comparison capability (reference: LogScaleAnnotations
Bayes-factor machinery, CHANGELOG v5; here -BetheFE == log Z on trees)."""

import numpy as np

import rxinfer_tpu as rx
from rxinfer_tpu.dists import GammaShapeRate, NormalMeanVariance


def _model(prior_var):
    @rx.model
    def m(y):
        x = rx.Normal(mean=0.0, var=prior_var)
        y.observe(rx.Normal(mean=x, variance=1.0))
        return {"x": x}

    return m


def test_log_evidence_exact_on_tree():
    y = np.asarray(0.7, np.float32)
    res = rx.infer(returnvars=rx.KeepLast(), model=_model(2.0), data={"y": y}, iterations=4,
                   free_energy=True)
    v = 3.0
    exact = -0.5 * np.log(2 * np.pi * v) - 0.7**2 / (2 * v)
    assert abs(float(res.log_evidence) - exact) < 1e-5


def test_bayes_factor_model_comparison():
    """Two prior hypotheses compared by log-evidence difference — the
    Bayes-factor use-case of the reference's log-scale annotations."""
    y = np.asarray(0.2, np.float32)
    le = []
    for pv in (0.5, 50.0):
        res = rx.infer(returnvars=rx.KeepLast(), model=_model(pv), data={"y": y}, iterations=4,
                       free_energy=True)
        le.append(float(res.log_evidence))
    exact_bf = (
        (-0.5 * np.log(2 * np.pi * 1.5) - 0.2**2 / 3.0)
        - (-0.5 * np.log(2 * np.pi * 51.0) - 0.2**2 / 102.0)
    )
    assert abs((le[0] - le[1]) - exact_bf) < 1e-5
    # small data near zero: the tighter prior wins
    assert le[0] > le[1]


def test_log_evidence_requires_fe():
    res = rx.infer(returnvars=rx.KeepLast(), model=_model(1.0), data={"y": np.asarray(0.0, np.float32)},
                   iterations=2)
    try:
        res.log_evidence
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "free_energy" in str(e)


def test_init_message_parity():
    """InitMessage (mu-form initialization) is accepted and equivalent."""
    @rx.model
    def gauss(y):
        mu = rx.Normal(mean=0.0, var=100.0)
        tau = rx.Gamma(shape=0.01, rate=0.01)
        for i in rx.plate(len(y)):
            y[i] = rx.Normal(mean=mu, precision=tau)
        return {"mu": mu, "tau": tau}

    y = (1.0 + np.random.default_rng(0).standard_normal(50)).astype(np.float32)
    r1 = rx.infer(returnvars=rx.KeepLast(), model=gauss, data={"y": y}, iterations=10,
                  initialization={"tau": rx.InitMessage(GammaShapeRate(0.01, 0.01))})
    r2 = rx.infer(returnvars=rx.KeepLast(), model=gauss, data={"y": y}, iterations=10,
                  initialization={"tau": GammaShapeRate(0.01, 0.01)})
    assert np.isclose(float(r1.posteriors["mu"].mean()),
                      float(r2.posteriors["mu"].mean()), rtol=1e-6)
