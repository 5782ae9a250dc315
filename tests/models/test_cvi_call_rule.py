"""CVIProjection delta method + direct rule invocation (reference:
CVIProjection / deprecated CVI, test/models/nonlinear/cvi_tests.jl;
@call_rule, docs/src/manuals/inference/create-node.md:197-228)."""

import numpy as np

import rxinfer_tpu as rx
from rxinfer_tpu.dists import (
    GammaShapeRate,
    NormalMeanPrecision,
    NormalMeanVariance,
    PointMass,
)


def test_cvi_projection_matches_linearization_on_smooth_fn():
    """On a gently nonlinear model the sampled projection agrees with the
    deterministic transforms (reference cvi_tests tolerance style)."""
    rng = np.random.default_rng(0)
    z_true = 1.3
    y = (np.sinh(z_true) + 0.3 * rng.standard_normal(60)).astype(np.float32)

    def build(method):
        @rx.model
        def m(y):
            z = rx.Normal(mean=0.0, var=10.0)
            w = rx.Delta(lambda x: np.e * 0 + x + 0.1 * x**3, z, method=method)
            for i in rx.plate(len(y)):
                y[i] = rx.Normal(mean=w, var=0.09)
            return {"z": z}

        return m

    res_cvi = rx.infer(returnvars=rx.KeepLast(), model=build(rx.CVIProjection(n_samples=4096, seed=1)),
                       data={"y": y}, iterations=10)
    res_lin = rx.infer(returnvars=rx.KeepLast(), model=build(rx.Linearization()),
                       data={"y": y}, iterations=10)
    m_cvi = float(res_cvi.posteriors["z"].mean())
    m_lin = float(res_lin.posteriors["z"].mean())
    assert abs(m_cvi - m_lin) < 0.1
    # both recover roughly the true latent
    assert abs(m_lin - 1.2) < 0.35


def test_cvi_alias_is_cviprojection():
    assert rx.CVI is rx.CVIProjection


def test_call_rule_message():
    """rx.call_rule invokes a registered rule directly (reference @call_rule)."""
    msg = rx.call_rule(
        "NormalMeanPrecision", "out",
        mean=NormalMeanVariance(np.float32(1.0), np.float32(0.5)),
        prec=PointMass(np.float32(4.0)),
    )
    assert abs(float(msg.mean()) - 1.0) < 1e-6
    # VMP forward: var = 1/E[prec] + Var[mean]... (structured rule: 1/w + vm)
    assert float(msg.var()) > 0.25


def test_call_rule_average_energy():
    ae = rx.call_rule(
        "NormalMeanPrecision", "average_energy",
        out=PointMass(np.float32(0.3)),
        mean=NormalMeanVariance(np.float32(0.0), np.float32(1.0)),
        prec=GammaShapeRate(np.float32(2.0), np.float32(2.0)),
    )
    assert np.isfinite(float(ae))


def test_call_rule_not_found_diagnostic():
    try:
        rx.call_rule("NormalMeanPrecision", "nonexistent")
        raise AssertionError("expected RuleNotFoundError")
    except KeyError as e:
        assert "rule-not-found" in str(e) or "Rule not found" in str(e)
