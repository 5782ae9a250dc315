"""Streaming HGF conformance — the reference's online hierarchical Gaussian
filter scenario (test/models/statespace/hgf_tests.jl:43-131): a SINGLE-step
GCV model driven through the STREAMING engine with @autoupdates, structured
``q(xt, zt, xt_min) = q(xt, xt_min)q(zt)`` constraints, ``keephistory``,
per-tick FE frames, and reference-style 3σ/6σ envelope + FE-discipline
assertions.  (The reference's scalar FE anchor 1.00988 is tied to its
StableRNG stream, which is not reproducible offline — SURVEY §4; the
envelopes and FE discipline are checked on our own simulated data, which is
the stronger per-datum check.)"""

import numpy as np

import rxinfer_tpu as rx
from rxinfer_tpu.dists import NormalMeanVariance

REAL_K, REAL_W = 1.0, 0.0
Z_VAR, Y_VAR = 0.2**2, 0.1**2
N = 400
VMP_ITERS = 10


def _generate(rng):
    z = np.zeros(N)
    x = np.zeros(N)
    y = np.zeros(N)
    z_prev = x_prev = 0.0
    for i in range(N):
        z[i] = z_prev + np.sqrt(Z_VAR) * rng.standard_normal()
        v = np.exp(REAL_K * z[i] + REAL_W)
        x[i] = x_prev + np.sqrt(v) * rng.standard_normal()
        y[i] = x[i] + np.sqrt(Y_VAR) * rng.standard_normal()
        z_prev, x_prev = z[i], x[i]
    return z, x, y.astype(np.float32)


@rx.model
def hgf_step(y, zt_min_mean, zt_min_var, xt_min_mean, xt_min_var):
    zt_min = rx.Normal(mean=zt_min_mean, var=zt_min_var)
    xt_min = rx.Normal(mean=xt_min_mean, var=xt_min_var)
    zt = rx.Normal(mean=zt_min, var=Z_VAR)
    xt = rx.GCV(xt_min, zt, kappa=REAL_K, omega=REAL_W)
    y.observe(rx.Normal(mean=xt, var=Y_VAR))
    return {"zt": zt, "xt": xt, "zt_min": zt_min, "xt_min": xt_min}


def test_streaming_hgf_online_inference():
    z_true, x_true, y = _generate(np.random.default_rng(42))

    autoupdates = rx.autoupdates(
        initial={
            "zt_min_mean": np.float32(0.0), "zt_min_var": np.float32(5.0),
            "xt_min_mean": np.float32(0.0), "xt_min_var": np.float32(5.0),
        },
        zt_min_mean=lambda q: q["zt"].mean(),
        zt_min_var=lambda q: q["zt"].var(),
        xt_min_mean=lambda q: q["xt"].mean(),
        xt_min_var=lambda q: q["xt"].var(),
    )

    engine = rx.infer(
        model=hgf_step,
        datastream=[{"y": y[t]} for t in range(N)],
        autoupdates=autoupdates,
        # the reference's explicit structured constraint: zt mean-field from
        # the (xt, xt_min) pair (the pair joint itself is the engine default,
        # kept via the cavity-reconstructed GCV cross)
        constraints=rx.constraints(
            factorization=rx.factorize(("xt", "zt"), ("xt_min", "zt"))),
        initialization={"zt": NormalMeanVariance(0.0, 5.0),
                        "xt": NormalMeanVariance(0.0, 5.0)},
        iterations=VMP_ITERS,
        keephistory=N,
        historyvars={"xt": rx.KeepLast(), "zt": rx.KeepLast()},
        free_energy=True,
    )

    assert len(engine.history) == N
    mz = np.array([float(h["zt"].mean()) for h in engine.history])
    sz = np.sqrt([float(h["zt"].var()) for h in engine.history])
    mx = np.array([float(h["xt"].mean()) for h in engine.history])
    sx = np.sqrt([float(h["xt"].var()) for h in engine.history])

    # reference envelope checks (hgf_tests.jl:122-131)
    assert np.all(np.abs(z_true - mz) < 6.0 * sz)
    assert np.all(np.abs(x_true - mx) < 6.0 * sx)
    assert np.mean(np.abs(z_true - mz) < 3.0 * sz) > 0.95
    assert np.mean(np.abs(x_true - mx) < 3.0 * sx) > 0.95

    # per-tick FE frames: (vmp_iters,) each; the tick-averaged per-iteration
    # FE must show VMP discipline — every LARGE step decreases
    # (hgf_tests.jl:120: all(filter(e -> abs(e) > 0.1, diff(fe)) .< 0))
    assert len(engine.fe_history) == N
    frames = np.stack([np.asarray(f) for f in engine.fe_history])
    assert frames.shape == (N, VMP_ITERS)
    assert np.isfinite(frames).all()
    fe_avg = frames.mean(axis=0)
    big = np.abs(np.diff(fe_avg)) > 0.1
    assert np.all(np.diff(fe_avg)[big] < 0), fe_avg
    # net improvement over the VMP iterations
    assert fe_avg[-1] < fe_avg[0]
