"""Dynamic-precision fused kernel tier (round 5, verdict r4 weak item 6).

Chains whose evidence precision and/or transition-noise precision is bound to
an EXTERNAL random variable (unknown observation noise tau, unknown process
noise W) used to fall back from the fused Pallas tier to the vmapped XLA scan
path.  The dynamic tier re-closes those precisions from the live state every
sweep and streams them into the kernel as traced per-chain (batch-varying)
tiles, so the flagship unknown-noise VMP shapes (reference: the hierarchical
Gaussian models of demos/ and src/model tests — e.g. kalman filtering with
unknown noise, inference.jl tutorial models) ride the kernel tier.

Every test compares the fused path against options={"fused_kernels": False}
(the vmapped scan oracle) across MULTIPLE sweeps — per-sweep re-closure wrong
by one Gauss-Seidel step would show up from iteration 2 on.
"""

import numpy as np
import pytest

import rxinfer_tpu as rx
from rxinfer_tpu.dists import GammaShapeRate, Wishart
from rxinfer_tpu.engine.batched import build_plans
from rxinfer_tpu.inference import batched_program


def _walk_tau_model():
    @rx.model
    def walk_tau(y):
        T = len(y)
        tau = rx.Gamma(shape=2.0, rate=2.0)
        x = rx.latent(T, name="x")
        x[0] = rx.Normal(mean=0.0, var=100.0)
        for t in rx.plate(1, T):
            x[t] = rx.Normal(mean=x[t - 1], var=0.25)
        for t in rx.plate(T):
            y[t] = rx.Normal(mean=x[t], precision=tau)

    return walk_tau, {"tau": GammaShapeRate(2.0, 2.0)}


def _compare(model, data, init, iterations=4, names=("x",), shared=(),
             atol=5e-5, rtol=1e-4, fe_atol=1e-3):
    kw = dict(iterations=iterations, free_energy=True, initialization=init,
              returnvars=rx.KeepLast(), shared=shared)
    fused = rx.infer_batched(model, data, **kw)
    scan = rx.infer_batched(model, data,
                            options={"fused_kernels": False}, **kw)
    for nm in names:
        qf, qs = fused[0][nm], scan[0][nm]
        np.testing.assert_allclose(np.asarray(qf.mean()),
                                   np.asarray(qs.mean()),
                                   atol=atol, rtol=rtol)
    np.testing.assert_allclose(np.asarray(fused[1]), np.asarray(scan[1]),
                               atol=fe_atol, rtol=1e-4)
    return fused, scan


def _plan_of(model, data, **opts):
    compiled, _ = batched_program(model, data, iterations=1, **opts)
    d0 = {k: np.asarray(v)[0] for k, v in data.items()}
    plans = build_plans(compiled, d0)
    return plans, compiled


def test_dyn_w_scalar_walk_tau_plans_and_matches_scan():
    """Unknown observation precision: the flagship dryrun fallback shape.

    The plan must lower fused with dynamic W, and the multi-sweep posterior
    trajectory (x means, q(tau) params, per-element FE) must match the scan
    oracle — the chain reads E[tau] at exactly the same Gauss-Seidel point."""
    model, init = _walk_tau_model()
    rng = np.random.default_rng(0)
    B, T = 3, 17   # odd T exercises the kernel's time padding
    y = np.cumsum(rng.standard_normal((B, T)), axis=1).astype(np.float32)

    plans, compiled = _plan_of(model, {"y": y}, initialization=init)
    assert "x" in plans, compiled.plan_report()
    plan = plans["x"]
    assert plan.dyn_w and not plan.dyn_q
    assert plan.W is None and plan.E is None
    assert compiled._plan_report["x"]["dynamic"] == ["W"]
    # the conjugate single-precision shape gets the W-LINEAR fast path
    # (probe-validated; xi/W from one tiny per-element matmul)
    assert plan.wlin is not None
    assert compiled._plan_report["x"]["w_linear"] is True

    fused, scan = _compare(model, {"y": y}, init)
    # per-element taus DIVERGE across the batch (no shared=): the kernel saw
    # genuinely batch-varying W tiles, not one broadcast constant
    tau_means = np.asarray(fused[0]["tau"].mean())
    assert tau_means.shape == (3,)
    assert np.ptp(tau_means) > 1e-3
    np.testing.assert_allclose(tau_means,
                               np.asarray(scan[0]["tau"].mean()), rtol=1e-4)


def test_dyn_w_matches_per_dataset_infer():
    """Element-wise ground truth: the batched dynamic path equals per-dataset
    single infer() runs (which never use batched plans at all)."""
    model, init = _walk_tau_model()
    rng = np.random.default_rng(1)
    B, T = 3, 12
    y = rng.standard_normal((B, T)).astype(np.float32)
    posts, fe = rx.infer_batched(model, {"y": y}, iterations=3,
                                 free_energy=True, initialization=init,
                                 returnvars=rx.KeepLast())
    for i in (0, B - 1):
        ref = rx.infer(model=model, data={"y": y[i]}, iterations=3,
                       free_energy=True, initialization=init,
                       returnvars=rx.KeepLast())
        np.testing.assert_allclose(np.asarray(posts["x"].mean())[i],
                                   np.asarray(ref.posteriors["x"].mean()),
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(posts["tau"].mean())[i],
                                   np.asarray(ref.posteriors["tau"].mean()),
                                   rtol=1e-4)
        assert abs(float(fe[-1, i]) - float(ref.free_energy[-1])) < 1e-3


def test_dyn_q_process_noise_scalar():
    """Unknown process-noise precision on the transition (dyn Q)."""
    @rx.model
    def walk_q(y):
        T = len(y)
        tw = rx.Gamma(shape=2.0, rate=1.0)
        x = rx.latent(T, name="x")
        x[0] = rx.Normal(mean=0.0, var=25.0)
        for t in rx.plate(1, T):
            x[t] = rx.Normal(mean=x[t - 1], precision=tw)
        for t in rx.plate(T):
            y[t] = rx.Normal(mean=x[t], var=0.5)

    init = {"tw": GammaShapeRate(2.0, 1.0)}
    rng = np.random.default_rng(2)
    y = np.cumsum(0.5 * rng.standard_normal((4, 15)), axis=1).astype(np.float32)

    plans, compiled = _plan_of(walk_q, {"y": y}, initialization=init)
    assert "x" in plans, compiled.plan_report()
    assert plans["x"].dyn_q and not plans["x"].dyn_w
    assert plans["x"].Q is None
    # static evidence keeps the plan-time linear-evidence fast path
    assert plans["x"].E is not None

    _compare(walk_q, {"y": y}, init, names=("x", "tw"))


def test_dyn_wq_mv_wishart_both():
    """Multivariate chain with BOTH precisions unknown: transition noise
    Wq ~ Wishart and observation noise Wr ~ Wishart (d=2)."""
    d = 2
    A = (0.9 * np.eye(d)).astype(np.float32)
    nu0 = float(d) + 1.0

    @rx.model
    def hier(y):
        T = len(y)
        Wq = rx.Wishart(nu0, np.eye(d, dtype=np.float32))
        Wr = rx.Wishart(nu0, np.eye(d, dtype=np.float32))
        x = rx.latent(T, name="x")
        x[0] = rx.MvNormal(mean=np.zeros(d, np.float32),
                           cov=(10.0 * np.eye(d)).astype(np.float32))
        for t in rx.plate(1, T):
            x[t] = rx.MvNormal(mean=A @ x[t - 1], precision=Wq)
        for t in rx.plate(T):
            y[t] = rx.MvNormal(mean=x[t], precision=Wr)

    init = {"Wq": Wishart(nu0, np.eye(d, dtype=np.float32)),
            "Wr": Wishart(nu0, np.eye(d, dtype=np.float32))}
    rng = np.random.default_rng(3)
    B, T = 3, 14
    ys = np.cumsum(rng.standard_normal((B, T, d)), axis=1).astype(np.float32)

    plans, compiled = _plan_of(hier, {"y": ys}, initialization=init)
    assert "x" in plans, compiled.plan_report()
    assert plans["x"].dyn_w and plans["x"].dyn_q
    assert compiled._plan_report["x"]["dynamic"] == ["W", "Q"]
    assert plans["x"].wlin is not None and not plans["x"].wlin[1]  # matrix v

    _compare(hier, {"y": ys}, init, names=("x", "Wq", "Wr"), atol=1e-4)


def test_dyn_w_two_precisions_rule_path():
    """TWO observation streams with DIFFERENT unknown precisions: the
    W-linear fast path requires a single precision variable, so this shape
    keeps the vmapped rule re-assembly — still fused, still matching the
    scan oracle."""
    @rx.model
    def two_tau(y1, y2):
        T = len(y1)
        tau1 = rx.Gamma(shape=2.0, rate=2.0)
        tau2 = rx.Gamma(shape=3.0, rate=1.0)
        x = rx.latent(T, name="x")
        x[0] = rx.Normal(mean=0.0, var=50.0)
        for t in rx.plate(1, T):
            x[t] = rx.Normal(mean=x[t - 1], var=0.3)
        for t in rx.plate(T):
            y1[t] = rx.Normal(mean=x[t], precision=tau1)
        for t in rx.plate(T):
            y2[t] = rx.Normal(mean=x[t], precision=tau2)

    init = {"tau1": GammaShapeRate(2.0, 2.0),
            "tau2": GammaShapeRate(3.0, 1.0)}
    rng = np.random.default_rng(7)
    B, T = 3, 13
    walk = np.cumsum(0.6 * rng.standard_normal((B, T)), axis=1)
    data = {
        "y1": (walk + 0.7 * rng.standard_normal((B, T))).astype(np.float32),
        "y2": (walk + 0.4 * rng.standard_normal((B, T))).astype(np.float32),
    }
    plans, compiled = _plan_of(two_tau, data, initialization=init)
    assert "x" in plans, compiled.plan_report()
    assert plans["x"].dyn_w and plans["x"].wlin is None
    _compare(two_tau, data, init, names=("x", "tau1", "tau2"))


def test_dyn_w_shared_tau_pooled():
    """shared=("tau",): the pooled conjugate update composes with the dynamic
    fused tier (this is the multichip dryrun's walk_tau stage)."""
    model, init = _walk_tau_model()
    rng = np.random.default_rng(4)
    y = np.cumsum(rng.standard_normal((4, 16)), axis=1).astype(np.float32)
    fused, scan = _compare(model, {"y": y}, init, shared=("tau",),
                           names=("x", "tau"))
    # pooled FE is the global scalar per iteration
    assert np.asarray(fused[1]).shape == (4,)


def test_dyn_plan_rejects_cavity_evidence():
    """A Delta (cavity-discipline) evidence factor with a random input keeps
    the chain OFF the dynamic tier — stored EP messages cannot ride the
    fused path."""
    @rx.model
    def delta_ev(y):
        T = len(y)
        z = rx.Normal(mean=0.0, var=1.0)
        x = rx.latent(T, name="x")
        x[0] = rx.Normal(mean=0.0, var=10.0)
        for t in rx.plate(1, T):
            x[t] = rx.Normal(mean=x[t - 1], var=0.5)
        for t in rx.plate(T):
            y[t] = rx.Normal(mean=rx.Delta(lambda a, b: a + b, x[t], z),
                             var=0.1)

    from rxinfer_tpu.dists import NormalMeanVariance

    rng = np.random.default_rng(5)
    y = rng.standard_normal((2, 8)).astype(np.float32)
    init = {"z": NormalMeanVariance(0.0, 1.0),
            "x": NormalMeanVariance(np.zeros(8, np.float32),
                                    10.0 * np.ones(8, np.float32))}
    with np.errstate(all="ignore"):
        compiled, _ = batched_program(delta_ev, {"y": y}, iterations=1,
                                      options={"warn": False},
                                      initialization=init)
        plans = build_plans(compiled, {"y": y[0]})
    assert "x" not in plans or not getattr(plans.get("x"), "dyn_w", False)


def test_dyn_w_respects_keep_each_history():
    """KeepEach across sweeps: per-iteration marginals ride the scan ys on
    the dynamic path exactly as on the scan path."""
    model, init = _walk_tau_model()
    rng = np.random.default_rng(6)
    y = rng.standard_normal((2, 10)).astype(np.float32)
    kw = dict(iterations=3, initialization=init, returnvars=rx.KeepEach())
    fused = rx.infer_batched(model, {"y": y}, **kw)
    scan = rx.infer_batched(model, {"y": y},
                            options={"fused_kernels": False}, **kw)
    assert isinstance(fused[0]["x"], list) and len(fused[0]["x"]) == 3
    for qf, qs in zip(fused[0]["x"], scan[0]["x"]):
        np.testing.assert_allclose(np.asarray(qf.mean()),
                                   np.asarray(qs.mean()), atol=5e-5)
