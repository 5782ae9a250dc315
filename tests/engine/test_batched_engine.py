"""Batch-native engine lowering (engine/batched.py): infer_batched dispatches
eligible chain blocks into the fused Pallas kernels and matches per-dataset
infer() exactly (f32 tolerance) — the round-2 headline contract (the kernel
tier reachable through the single user entry point; reference discipline:
src/inference/inference.jl:577-733)."""

import numpy as np
import pytest

import rxinfer_tpu as rx
from rxinfer_tpu.dists import DirichletCollection, GammaShapeRate
from rxinfer_tpu.engine.batched import build_plans
from rxinfer_tpu.inference import batched_program
from rxinfer_tpu.models import zoo


def _lgssm_gen(d=2):
    theta = np.pi / 35
    A = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]], np.float32)
    Q = np.eye(d, dtype=np.float32)
    B = 1.3 * np.eye(d, dtype=np.float32)
    R = np.eye(d, dtype=np.float32)
    return zoo.lgssm(A, Q, B, R, np.zeros(d, np.float32),
                     25.0 * np.eye(d, dtype=np.float32))


def test_lgssm_batched_uses_fused_kernel_and_matches_infer():
    gen = _lgssm_gen()
    rng = np.random.default_rng(0)
    B, T = 5, 60
    y = rng.standard_normal((B, T, 2)).astype(np.float32)

    compiled, _ = batched_program(gen, {"y": y}, iterations=1,
                                  free_energy=True)
    plans = build_plans(compiled, {"y": y[0]})
    assert "x" in plans and type(plans["x"]).__name__ == "FusedGaussianPlan"

    posts, fe = rx.infer_batched(gen, {"y": y}, iterations=1,
                                 free_energy=True)
    assert fe.shape == (1, B)
    for i in (0, B - 1):
        ref = rx.infer(returnvars=rx.KeepLast(), model=gen, data={"y": y[i]}, iterations=1,
                       free_energy=True)
        np.testing.assert_allclose(
            np.asarray(posts["x"].mean())[i],
            np.asarray(ref.posteriors["x"].mean()), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(posts["x"].cov())[i],
            np.asarray(ref.posteriors["x"].cov()), atol=2e-5)
        assert abs(float(fe[-1, i]) - float(ref.free_energy[-1])) < 1e-3


def test_lgssm_batched_missing_data_falls_back_and_stays_correct():
    """NaN observations disable the fused Gaussian plan (its evidence
    precision is a kernel constant); the vmapped XLA path handles masking."""
    gen = _lgssm_gen()
    rng = np.random.default_rng(1)
    B, T = 3, 40
    y = rng.standard_normal((B, T, 2)).astype(np.float32)
    y[1, 7] = np.nan

    posts, _ = rx.infer_batched(gen, {"y": y}, iterations=1)
    ref = rx.infer(returnvars=rx.KeepLast(), model=gen, data={"y": y[1]}, iterations=1)
    np.testing.assert_allclose(
        np.asarray(posts["x"].mean())[1],
        np.asarray(ref.posteriors["x"].mean()), atol=2e-5)


def test_lgssm_batched_fused_kernels_option_off():
    gen = _lgssm_gen()
    rng = np.random.default_rng(2)
    y = rng.standard_normal((3, 30, 2)).astype(np.float32)
    compiled, _ = batched_program(gen, {"y": y}, iterations=1,
                                  options={"fused_kernels": False})
    assert build_plans(compiled, {"y": y[0]}) == {}
    posts, _ = rx.infer_batched(gen, {"y": y}, iterations=1,
                                options={"fused_kernels": False})
    ref = rx.infer(returnvars=rx.KeepLast(), model=gen, data={"y": y[0]}, iterations=1)
    np.testing.assert_allclose(
        np.asarray(posts["x"].mean())[0],
        np.asarray(ref.posteriors["x"].mean()), atol=2e-5)


def test_hmm_batched_fused_forward_backward_matches_infer():
    """Discrete chains lower to the fused kernel with per-batch transition
    tables; per-step xis feed the Dirichlet transition update AND the chain
    pair-entropy FE (reference structured FE,
    src/model/plugins/reactivemp_free_energy.jl:57-63)."""
    rng = np.random.default_rng(0)
    B, T = 4, 40
    a_true = np.array([[0.9, 0.05, 0.05], [0.05, 0.9, 0.05],
                       [0.05, 0.05, 0.9]])
    yh = np.zeros((B, T), np.int64)
    for b in range(B):
        s = rng.integers(3)
        for t in range(T):
            s = rng.choice(3, p=a_true[:, s])
            yh[b, t] = rng.choice(3, p=a_true[:, s])
    y1 = np.eye(3, dtype=np.float32)[yh]
    init = {"A": DirichletCollection(np.full((3, 3), 1.0, np.float32)),
            "B": DirichletCollection(np.float32(np.eye(3) * 5.0 + 1.0))}
    gen = zoo.hmm(3, 3)

    compiled, _ = batched_program(gen, {"y": y1}, iterations=8,
                                  initialization=init)
    assert build_plans(compiled, {"y": y1[0]}).get("s") == "discrete"

    posts, fe = rx.infer_batched(gen, {"y": y1}, iterations=8,
                                 free_energy=True, initialization=init)
    assert fe.shape == (8, B)
    for i in (0, B - 1):
        ref = rx.infer(returnvars=rx.KeepLast(), model=gen, data={"y": y1[i]}, iterations=8,
                       free_energy=True, initialization=init)
        np.testing.assert_allclose(
            np.asarray(posts["s"].logits)[i]
            - np.asarray(ref.posteriors["s"].logits),
            0.0, atol=5e-5)
        np.testing.assert_allclose(
            np.asarray(posts["A"].alpha)[i],
            np.asarray(ref.posteriors["A"].alpha), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(fe)[:, i], np.asarray(ref.free_energy), atol=5e-3)


def test_batched_plain_groups_keep_each_and_fe_history():
    rng = np.random.default_rng(0)
    B, n = 6, 80
    true_mu = np.linspace(-2.0, 3.0, B).astype(np.float32)
    y = (true_mu[:, None]
         + 0.3 * rng.standard_normal((B, n))).astype(np.float32)

    @rx.model
    def gauss(y):
        mu = rx.Normal(mean=0.0, var=100.0)
        tau = rx.Gamma(shape=0.01, rate=0.01)
        for i in rx.plate(n):
            y[i] = rx.Normal(mean=mu, precision=tau)
        return {"mu": mu, "tau": tau}

    posts, fe = rx.infer_batched(
        gauss, {"y": y}, iterations=10, free_energy=True,
        initialization={"tau": GammaShapeRate(0.01, 0.01)},
        returnvars=rx.KeepEach(),
    )
    assert isinstance(posts["mu"], list) and len(posts["mu"]) == 10
    np.testing.assert_allclose(np.asarray(posts["mu"][-1].mean()), true_mu,
                               atol=0.15)
    fe = np.asarray(fe)
    assert fe.shape == (10, B)
    assert (np.diff(fe, axis=0) <= 1e-4 * np.abs(fe[0])).all()


def test_batched_chain_with_random_noise_rides_dynamic_tier():
    """Unknown process noise: the transition precision is a per-dataset
    posterior — since round 5 this rides the DYNAMIC fused tier (per-sweep
    re-closed Q streamed as traced tiles; tests/engine/test_fused_dynamic.py)
    and must still produce the same answer as per-dataset infer."""

    @rx.model
    def rw(y):
        T = len(y)
        w = rx.Gamma(shape=1.0, rate=1.0)
        x = rx.latent(T, name="x")
        x[0] = rx.Normal(mean=0.0, var=10.0)
        for t in rx.plate(1, T):
            x[t] = rx.Normal(mean=x[t - 1], precision=w)
        for t in rx.plate(T):
            y[t] = rx.Normal(mean=x[t], var=0.5)
        return {"x": x, "w": w}

    rng = np.random.default_rng(3)
    B, T = 3, 30
    y = np.cumsum(rng.standard_normal((B, T)), axis=1).astype(np.float32)
    init = {"w": GammaShapeRate(1.0, 1.0)}

    compiled, _ = batched_program(rw, {"y": y}, iterations=5,
                                  initialization=init)
    plans = build_plans(compiled, {"y": y[0]})
    assert "x" in plans and plans["x"].dyn_q and plans["x"].Q is None

    posts, fe = rx.infer_batched(rw, {"y": y}, iterations=5,
                                 free_energy=True, initialization=init)
    for i in (0, 2):
        ref = rx.infer(returnvars=rx.KeepLast(), model=rw, data={"y": y[i]}, iterations=5,
                       free_energy=True, initialization=init)
        np.testing.assert_allclose(
            np.asarray(posts["x"].mean())[i],
            np.asarray(ref.posteriors["x"].mean()), atol=3e-5)
        np.testing.assert_allclose(
            np.asarray(posts["w"].mean())[i],
            np.asarray(ref.posteriors["w"].mean()), rtol=2e-5)
        np.testing.assert_allclose(np.asarray(fe)[:, i],
                                   np.asarray(ref.free_energy), atol=1e-3)


def test_batched_predictvars():
    gen = _lgssm_gen()
    rng = np.random.default_rng(4)
    B, T = 3, 25
    y = rng.standard_normal((B, T, 2)).astype(np.float32)
    result = rx.infer_batched(gen, {"y": y}, iterations=1,
                              predictvars=["y"])
    posts, fe = result  # arity stays 2 with predictvars (no 3-tuple trap)
    preds = result.predictions
    assert result.posteriors is posts and result.free_energy is fe
    assert np.asarray(preds["y"].mean()).shape == (B, T, 2)
    ref = rx.infer(returnvars=rx.KeepLast(), model=gen, data={"y": y[0]}, iterations=1,
                   predictvars=["y"])
    np.testing.assert_allclose(np.asarray(preds["y"].mean())[0],
                               np.asarray(ref.predictions["y"].mean()),
                               atol=2e-5)


def test_per_step_xi_kernel_matches_xla_forward_backward():
    from rxinfer_tpu.ops.discrete_chain import forward_backward
    from rxinfer_tpu.ops.pallas_discrete import fused_fb_batched

    rng = np.random.default_rng(5)
    B, T, K = 3, 37, 4
    lp = rng.standard_normal((B, K)).astype(np.float32)
    lt = rng.standard_normal((B, K, K)).astype(np.float32)
    le = rng.standard_normal((T, B, K)).astype(np.float32)
    g, xi_sum, logz, xis = fused_fb_batched(
        lp, lt, le, chunk=8, per_step_xi=True, interpret=True)
    assert xis.shape == (T - 1, B, K, K)
    np.testing.assert_allclose(np.asarray(xis).sum(0), np.asarray(xi_sum),
                               atol=1e-4)
    for b in range(B):
        res = forward_backward(
            lp[b], np.broadcast_to(lt[b], (T - 1, K, K)), le[:, b])
        np.testing.assert_allclose(np.asarray(xis)[:, b], np.asarray(res.xis),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(g)[:, b], np.asarray(res.gammas),
                                   atol=2e-5)


def _noisy_obs_model(T):
    @rx.model
    def m(y, v):
        x = rx.latent(T, name="x")
        x[0] = rx.Normal(mean=0.0, var=10.0)
        for t in rx.plate(1, T):
            x[t] = rx.Normal(mean=x[t - 1], var=1.0)
        for t in rx.plate(T):
            y[t] = rx.Normal(mean=x[t], var=v[t])
        return {"x": x}

    return m


def test_batched_data_valued_noise_falls_back_and_stays_correct():
    """Per-dataset observation noise passed as DATA makes the evidence
    precision W batch-dependent: the constant-W kernel must refuse the plan
    (baking W from batch element 0 silently corrupts every other element —
    round-2 advisor finding) and the vmapped path must match per-dataset
    infer for every element."""
    rng = np.random.default_rng(7)
    B, T = 3, 30
    m = _noisy_obs_model(T)
    # time-constant per dataset (so W IS time-invariant within element 0 —
    # the exact shape that fooled the old numeric check), batch-varying
    v = np.stack([np.full(T, s, np.float32) for s in (0.1, 1.0, 10.0)])
    y = np.cumsum(rng.standard_normal((B, T)), axis=1).astype(np.float32)

    compiled, _ = batched_program(m, {"y": y, "v": v}, iterations=1)
    plans = build_plans(compiled, {"y": y[0], "v": v[0]})
    assert plans == {}
    report = compiled.plan_report()
    assert report["x"]["fused"] is False
    assert "data-valued" in report["x"]["reason"]

    posts, _ = rx.infer_batched(m, {"y": y, "v": v}, iterations=1)
    for i in range(B):
        ref = rx.infer(returnvars=rx.KeepLast(), model=m, data={"y": y[i], "v": v[i]}, iterations=1)
        np.testing.assert_allclose(
            np.asarray(posts["x"].mean())[i],
            np.asarray(ref.posteriors["x"].mean()), atol=3e-5)
        np.testing.assert_allclose(
            np.asarray(posts["x"].var())[i],
            np.asarray(ref.posteriors["x"].var()), atol=3e-5)


def test_plan_report_eligible_ineligible_and_warning():
    """compiled.plan_report() names every chain block with fused/kernel or a
    fallback reason; falling off the kernel tier warns (round-2 verdict #6)."""
    gen = _lgssm_gen()
    rng = np.random.default_rng(8)
    y = rng.standard_normal((2, 31, 2)).astype(np.float32)
    compiled, _ = batched_program(gen, {"y": y}, iterations=1)
    rep = compiled.plan_report()
    assert rep == {"x": {"fused": True, "kernel": "pallas_smoother"}}

    # random transition precision rides the DYNAMIC tier since round 5
    @rx.model
    def rw(y):
        T = len(y)
        w = rx.Gamma(shape=1.0, rate=1.0)
        x = rx.latent(T, name="x")
        x[0] = rx.Normal(mean=0.0, var=10.0)
        for t in rx.plate(1, T):
            x[t] = rx.Normal(mean=x[t - 1], precision=w)
        for t in rx.plate(T):
            y[t] = rx.Normal(mean=x[t], var=0.5)
        return {"x": x, "w": w}

    y1 = np.cumsum(rng.standard_normal((2, 23)), axis=1).astype(np.float32)
    init = {"w": GammaShapeRate(1.0, 1.0)}
    compiled_dyn, _ = batched_program(rw, {"y": y1}, iterations=2,
                                      initialization=init)
    assert compiled_dyn.plan_report()["x"] == {
        "fused": True, "kernel": "pallas_smoother", "dynamic": ["Q"]}

    # ineligible: DATA-valued transition noise → reasoned fallback + warning
    @rx.model
    def rw_v(y, v):
        T = len(y)
        x = rx.latent(T, name="x")
        x[0] = rx.Normal(mean=0.0, var=10.0)
        for t in rx.plate(1, T):
            x[t] = rx.Normal(mean=x[t - 1], var=v[t])
        for t in rx.plate(T):
            y[t] = rx.Normal(mean=x[t], var=0.5)
        return {"x": x}

    y1v = np.cumsum(rng.standard_normal((2, 23)), axis=1).astype(np.float32)
    vv = np.full((2, 23), 0.5, np.float32)
    with pytest.warns(UserWarning, match="fused Pallas"):
        compiled2, _ = batched_program(rw_v, {"y": y1v, "v": vv},
                                       iterations=2)
    rep2 = compiled2.plan_report()
    assert rep2["x"]["fused"] is False
    assert "transition" in rep2["x"]["reason"]

    # warn=False silences the fallback warning
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        y2 = np.cumsum(rng.standard_normal((2, 24)), axis=1).astype(np.float32)
        v2 = np.full((2, 24), 0.5, np.float32)
        batched_program(rw_v, {"y": y2, "v": v2}, iterations=2,
                        options={"warn": False})

    # the single-dataset path has no kernel tier to report
    ref = rx.infer(returnvars=rx.KeepLast(), model=gen, data={"y": y[0]}, iterations=1)
    with pytest.raises(ValueError, match="batched"):
        ref.model.plan_report()


def test_infer_batched_annotations_supported():
    """Round 4: the batched/single-program asymmetry is gone — annotations=
    runs the vmapped logscale post-pass; each posterior's log_scale carries
    the batch axis and equals −FE (== log Z on this tree model)."""
    gen = _lgssm_gen()
    rng = np.random.default_rng(5)
    y = rng.standard_normal((2, 10, 2)).astype(np.float32)
    res = rx.infer_batched(gen, {"y": y}, iterations=1, free_energy=True,
                           annotations=rx.LogScaleAnnotations())
    ls = np.asarray(rx.getlogscale(res.posteriors["x"]))
    assert ls.shape == (2,)
    np.testing.assert_allclose(ls, -np.asarray(res.free_energy)[-1],
                               rtol=1e-5)


def test_hbm_batch_chunking_matches_unchunked():
    """B×T HBM wall (round-2 verdict #9): oversized batches are processed as
    sequential chunks of one compiled program; results must match the
    unchunked run exactly, including a padded final chunk."""
    gen = _lgssm_gen()
    rng = np.random.default_rng(11)
    B, T = 7, 40
    y = rng.standard_normal((B, T, 2)).astype(np.float32)

    ref_posts, ref_fe = rx.infer_batched(gen, {"y": y}, iterations=2,
                                         free_energy=True)
    # tiny budget → forces chunking (chunk of 3 → chunks 3/3/1-padded)
    from rxinfer_tpu.engine.batched import (
        batch_chunk_size,
        chain_hbm_bytes_per_element,
    )

    compiled, _ = batched_program(gen, {"y": y}, iterations=2,
                                  free_energy=True)
    per = chain_hbm_bytes_per_element(compiled)
    assert per > 0
    with pytest.warns(UserWarning, match="sequential chunks"):
        posts, fe = rx.infer_batched(
            gen, {"y": y}, iterations=2, free_energy=True,
            options={"hbm_budget_bytes": per * 3},
        )
    np.testing.assert_allclose(np.asarray(posts["x"].mean()),
                               np.asarray(ref_posts["x"].mean()), atol=1e-6)
    np.testing.assert_allclose(np.asarray(fe), np.asarray(ref_fe), atol=1e-5)

    # KeepEach history also chunks correctly
    with pytest.warns(UserWarning, match="sequential chunks"):
        posts_e, _ = rx.infer_batched(
            gen, {"y": y}, iterations=2, free_energy=True,
            returnvars=rx.KeepEach(),
            options={"hbm_budget_bytes": per * 3},
        )
    assert isinstance(posts_e["x"], list) and len(posts_e["x"]) == 2
    np.testing.assert_allclose(np.asarray(posts_e["x"][-1].mean()),
                               np.asarray(ref_posts["x"].mean()), atol=1e-6)

    # a single element over budget is a pointed error, not a silent OOM
    with pytest.raises(ValueError, match="HBM budget"):
        batch_chunk_size(compiled, B, per // 2)


def test_linear_evidence_extraction_matches_rule_path():
    """The plan's (E, c) affine evidence map (one fused einsum from raw
    observations) reproduces the rule-assembled xi exactly; round-3 closing
    of the engine/ops gap (verdict item 10)."""
    import jax
    import jax.numpy as jnp

    gen = _lgssm_gen()
    rng = np.random.default_rng(3)
    T = 40
    y0 = rng.standard_normal((T, 2)).astype(np.float32)

    compiled, _ = batched_program(gen, {"y": y0[None]}, iterations=1,
                                  free_energy=False)
    plans = build_plans(compiled, {"y": y0})
    plan = plans["x"]
    assert plan.E is not None and "y" in plan.E
    assert plan.E["y"].shape == (2, 2)
    assert plan.c.shape == (T, 2)

    block = [b for k, b in compiled.blocks if k == "chain"][0]
    xi_rule, _ = jax.jit(
        lambda d: block._evidence({}, d, {}, T)
    )({"y": jnp.asarray(y0)})
    xi_lin = y0.reshape(T, -1) @ plan.E["y"].T + plan.c
    np.testing.assert_allclose(np.asarray(xi_rule), xi_lin,
                               rtol=1e-5, atol=1e-5)


def test_linear_evidence_offset_bias_in_c():
    """A constant observation-mean offset lands in the affine bias c, and the
    fused batched result still matches per-dataset infer()."""

    @rx.model
    def m(y):
        x = rx.latent(30, name="x")
        x[0] = rx.Normal(mean=0.0, var=5.0)
        for t in rx.plate(1, 30):
            x[t] = rx.Normal(mean=x[t - 1], var=0.5)
        for t in rx.plate(30):
            y[t] = rx.Normal(mean=x[t] + 2.0, var=0.3)
        return {"x": x}

    rng = np.random.default_rng(5)
    y = (2.0 + rng.standard_normal((4, 30))).astype(np.float32)
    compiled, _ = batched_program(m, {"y": y}, iterations=1,
                                  free_energy=False)
    plans = build_plans(compiled, {"y": y[0]})
    plan = plans.get("x")
    if plan is not None and plan.E is not None:
        assert np.any(plan.c)  # the +2.0 offset must appear as a bias
    posts, _ = rx.infer_batched(m, {"y": y}, iterations=1)
    for i in (0, 3):
        ref = rx.infer(returnvars=rx.KeepLast(), model=m, data={"y": y[i]},
                       iterations=1)
        np.testing.assert_allclose(
            np.asarray(posts["x"].mean())[i],
            np.asarray(ref.posteriors["x"].mean()), atol=5e-5)
