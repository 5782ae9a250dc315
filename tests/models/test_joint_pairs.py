"""Joint (non-factorized) q across variable groups — round-2 verdict item 5.

The engine's default keeps a structured joint cluster q(out, in) on GCV
factors (reconstructed from cavity messages), which IS the reference HGF
constraint ``q(xt, zt, xt_min) = q(xt, xt_min)q(zt)``
(/root/reference/test/models/statespace/hgf_tests.jl:34-36); an explicit
``factorize(("xt", "xt_min"))`` split degrades it to mean-field.  FE ordering:
exact == −log Z ≤ structured ≤ mean-field."""

import numpy as np

import rxinfer_tpu as rx
from rxinfer_tpu.dists import NormalMeanVariance


def _single_step_model(v_noise, y_var):
    """x0 → x1 via GCV with CONSTANT volatility (== known-variance Gaussian
    link), observed y: a tree, so the structured FE must equal −log Z."""
    omega = float(np.log(v_noise))

    @rx.model
    def m(y):
        x0 = rx.Normal(mean=0.0, var=1.0)
        x1 = rx.GCV(x0, 0.0, kappa=1.0, omega=omega)
        y.observe(rx.Normal(mean=x1, var=y_var))
        return {"x0": x0, "x1": x1}

    return m


def test_gcv_joint_pair_fe_equals_logz_and_beats_meanfield():
    v_noise, y_var = 0.5, 0.1
    yv = np.float32(1.3)
    m = _single_step_model(v_noise, y_var)
    init = {"x0": NormalMeanVariance(0.0, 1.0),
            "x1": NormalMeanVariance(0.0, 1.0)}

    res = rx.infer(model=m, data={"y": yv}, iterations=20, free_energy=True,
                   returnvars=rx.KeepLast(), initialization=init)
    fe_joint = float(res.free_energy[-1])

    # analytic −log Z: y ~ N(0, 1 + v_noise + y_var)
    from scipy.stats import norm

    log_z = float(norm(0.0, np.sqrt(1.0 + v_noise + y_var)).logpdf(float(yv)))
    assert abs(fe_joint + log_z) < 2e-3, (fe_joint, -log_z)

    # splitting the pair degrades to mean-field: strictly larger FE
    res_mf = rx.infer(
        model=m, data={"y": yv}, iterations=40, free_energy=True,
        returnvars=rx.KeepLast(), initialization=init,
        constraints=rx.constraints(
            factorization=rx.factorize(("x1", "x0"))),
    )
    fe_mf = float(res_mf.free_energy[-1])
    assert fe_mf > fe_joint + 1e-3, (fe_mf, fe_joint)


def test_reference_hgf_constraint_split_is_engine_default():
    """The reference's q(xt, zt, xt_min) = q(xt, xt_min)q(zt) splits only
    ACROSS the GCV cluster boundary — under this engine's semantics that is
    the default, so passing it must leave the joint pair intact (identical
    FE with and without the constraint)."""

    @rx.model
    def m(y):
        zt = rx.Normal(mean=0.0, var=0.5)
        x0 = rx.Normal(mean=0.0, var=1.0)
        x1 = rx.GCV(x0, zt, kappa=1.0, omega=-1.0)
        y.observe(rx.Normal(mean=x1, var=0.1))
        return {"zt": zt, "x0": x0, "x1": x1}

    init = {"x0": NormalMeanVariance(0.0, 1.0),
            "x1": NormalMeanVariance(0.0, 1.0),
            "zt": NormalMeanVariance(0.0, 0.5)}
    yv = np.float32(-0.7)
    res_a = rx.infer(model=m, data={"y": yv}, iterations=10,
                     free_energy=True, returnvars=rx.KeepLast(),
                     initialization=init)
    res_b = rx.infer(
        model=m, data={"y": yv}, iterations=10, free_energy=True,
        returnvars=rx.KeepLast(), initialization=init,
        constraints=rx.constraints(
            factorization=rx.factorize(("x1", "zt"), ("x0", "zt"))),
    )
    assert abs(float(res_a.free_energy[-1])
               - float(res_b.free_energy[-1])) < 1e-6


def test_online_hgf_reference_envelopes():
    """Online (streaming, single-step + autoupdates) HGF mirroring
    hgf_tests.jl:10-131: structured q(xt, xt_min)q(zt), 6σ envelopes for all
    states, ≥95% within 3σ, positive variances, large FE diffs negative.
    (The reference's exact FE anchor 1.009879989585 depends on its StableRNG
    stream, not reproducible here.)"""
    rng = np.random.default_rng(42)
    k, w = 1.0, 0.0
    z_variance = 0.2 ** 2
    y_variance = 0.1 ** 2
    n = 300
    z_prev = x_prev = 0.0
    zs, xs, ys = [], [], []
    for _ in range(n):
        z_prev = z_prev + np.sqrt(z_variance) * rng.standard_normal()
        v = np.exp(k * z_prev + w)
        x_prev = x_prev + np.sqrt(v) * rng.standard_normal()
        zs.append(z_prev)
        xs.append(x_prev)
        ys.append(x_prev + np.sqrt(y_variance) * rng.standard_normal())
    zs, xs = np.asarray(zs), np.asarray(xs)

    @rx.model
    def hgf_step(y, zm, zv, xm, xv):
        zt_min = rx.Normal(mean=zm, var=zv)
        xt_min = rx.Normal(mean=xm, var=xv)
        zt = rx.Normal(mean=zt_min, var=z_variance)
        xt = rx.GCV(xt_min, zt, kappa=k, omega=w)
        y.observe(rx.Normal(mean=xt, var=y_variance))
        return {"zt": zt, "xt": xt}

    au = rx.autoupdates(
        initial={"zm": 0.0, "zv": 5.0, "xm": 0.0, "xv": 5.0},
        zm=lambda q: q["zt"].mean(),
        zv=lambda q: q["zt"].var(),
        xm=lambda q: q["xt"].mean(),
        xv=lambda q: q["xt"].var(),
    )
    engine = rx.infer(
        model=hgf_step, datastream=None, autoupdates=au, iterations=10,
        free_energy=True, keephistory=n,
        initialization={"zt": NormalMeanVariance(0.0, 5.0),
                        "xt": NormalMeanVariance(0.0, 5.0)},
    )
    for y_t in ys:
        engine.on_next({"y": np.float32(y_t)})

    mx = np.array([float(h["xt"].mean()) for h in engine.history])
    sx = np.sqrt(np.array([float(h["xt"].var()) for h in engine.history]))
    mz = np.array([float(h["zt"].mean()) for h in engine.history])
    sz = np.sqrt(np.array([float(h["zt"].var()) for h in engine.history]))

    assert np.all(sx > 0) and np.all(sz > 0)
    # all states within 6σ (reference :120-121)
    assert np.all(np.abs(xs - mx) < 6.0 * sx)
    assert np.all(np.abs(zs - mz) < 6.0 * sz)
    # ≥95% within 3σ (reference :123-130)
    assert np.mean(np.abs(xs - mx) < 3.0 * sx) > 0.95
    assert np.mean(np.abs(zs - mz) < 3.0 * sz) > 0.95
    # reference :117-118 asserts on free_energy_history — the ScoreActor's
    # per-iteration snapshot AVERAGED across ticks (src/score/actor.jl:89-113)
    fe_avg = np.mean(np.stack([np.asarray(f) for f in engine.fe_history]),
                     axis=0)
    diffs = np.diff(fe_avg)
    assert np.all(diffs[np.abs(diffs) > 0.1] < 0), fe_avg
