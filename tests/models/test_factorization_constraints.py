"""Factorization constraints (reference: GraphPPL @constraints DSL,
docs/src/manuals/variational/constraints-specification.md:107-292).

``q(x,y) = q(x)q(y)`` splits and ``MeanField()`` switch the affected factors
from the default structured (BP) semantics to mean-field VMP message rules and
mean-field Bethe accounting.  Verified against an independent numpy
coordinate-ascent oracle.
"""

import numpy as np

import rxinfer_tpu as rx
from rxinfer_tpu.dists import NormalMeanVariance

V0, V1, V2 = 4.0, 1.0, 1.0
Y = 1.5


def _make_model():
    @rx.model
    def pair(y):
        a = rx.Normal(mean=0.0, var=V0)
        b = rx.Normal(mean=a, var=V1)
        y.observe(rx.Normal(mean=b, variance=V2))
        return {"a": a, "b": b}

    return pair


def _mean_field_oracle(iters, ma=0.0, va=1e6):
    """Coordinate ascent under q(a)q(b): q(b) ∝ N(b; E[a], V1) N(y; b, V2),
    q(a) ∝ N(a; 0, V0) N(E[b]; a, V1)."""
    for _ in range(iters):
        wb = 1.0 / V1 + 1.0 / V2
        mb = (ma / V1 + Y / V2) / wb
        vb = 1.0 / wb
        wa = 1.0 / V0 + 1.0 / V1
        ma = (mb / V1) / wa
        va = 1.0 / wa
    return ma, va, mb, vb


def _mean_field_fe(ma, va, mb, vb):
    """Mean-field Bethe FE: Σ AE_a − Σ H_a + Σ (d_i − 1) H_i.

    Factors: prior(a) [AE − H(a)], link(b|a) mean-field [AE − H(a) − H(b)],
    lik(y|b) [AE − H(b)]; variables a, b have degree 2 → +H(a) + H(b)."""
    l2pi = np.log(2 * np.pi)

    def h(v):
        return 0.5 * np.log(2 * np.pi * np.e * v)

    ae_prior = 0.5 * (l2pi + np.log(V0) + (ma**2 + va) / V0)
    ae_link = 0.5 * (l2pi + np.log(V1) + ((mb - ma) ** 2 + va + vb) / V1)
    ae_lik = 0.5 * (l2pi + np.log(V2) + ((Y - mb) ** 2 + vb) / V2)
    return ae_prior + ae_link + ae_lik - h(va) - h(vb)


def test_factorize_pair_matches_vmp_oracle():
    cons = rx.constraints(factorization=rx.factorize(("a", "b")))
    init = {"a": NormalMeanVariance(0.0, 1.0e6)}
    res = rx.infer(returnvars=rx.KeepLast(), model=_make_model(), data={"y": np.asarray(Y, np.float32)},
                   iterations=30, constraints=cons, initialization=init,
                   free_energy=True)
    ma, va, mb, vb = _mean_field_oracle(30)
    assert np.isclose(float(res.posteriors["a"].mean()), ma, rtol=1e-4)
    assert np.isclose(float(res.posteriors["a"].var()), va, rtol=1e-4)
    assert np.isclose(float(res.posteriors["b"].mean()), mb, rtol=1e-4)
    assert np.isclose(float(res.posteriors["b"].var()), vb, rtol=1e-4)
    fe = np.asarray(res.free_energy, np.float64)
    assert abs(fe[-1] - _mean_field_fe(ma, va, mb, vb)) < 1e-4
    # mean-field FE upper-bounds the exact -log Z
    v_tot = V0 + V1 + V2
    neg_log_z = 0.5 * np.log(2 * np.pi * v_tot) + Y**2 / (2 * v_tot)
    assert fe[-1] > neg_log_z + 1e-3


def test_mean_field_global_matches_pairwise_here():
    cons_mf = rx.constraints(factorization=rx.MeanField())
    cons_pair = rx.constraints(factorization=rx.factorize(("a", "b")))
    init = {"a": NormalMeanVariance(0.0, 1.0e6)}
    data = {"y": np.asarray(Y, np.float32)}
    r1 = rx.infer(returnvars=rx.KeepLast(), model=_make_model(), data=data, iterations=30,
                  constraints=cons_mf, initialization=init)
    r2 = rx.infer(returnvars=rx.KeepLast(), model=_make_model(), data=data, iterations=30,
                  constraints=cons_pair, initialization=init)
    for n in ("a", "b"):
        assert np.isclose(float(r1.posteriors[n].mean()),
                          float(r2.posteriors[n].mean()), rtol=1e-6)


def test_default_is_exact_bp_not_mean_field():
    res = rx.infer(returnvars=rx.KeepLast(), model=_make_model(), data={"y": np.asarray(Y, np.float32)},
                   iterations=10, free_energy=True)
    v_tot = V0 + V1 + V2
    neg_log_z = 0.5 * np.log(2 * np.pi * v_tot) + Y**2 / (2 * v_tot)
    fe = np.asarray(res.free_energy, np.float64)
    assert abs(fe[-1] - neg_log_z) < 1e-4
    assert np.isclose(float(res.posteriors["a"].mean()), V0 * Y / v_tot,
                      rtol=1e-4)


def test_unknown_variable_in_constraint_raises():
    cons = rx.constraints(factorization=rx.factorize(("a", "zz")))
    try:
        rx.infer(returnvars=rx.KeepLast(), model=_make_model(), data={"y": np.asarray(Y, np.float32)},
                 iterations=2, constraints=cons)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "unknown" in str(e).lower()
