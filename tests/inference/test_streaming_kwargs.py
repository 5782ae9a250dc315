"""Streaming kwarg-surface parity (reference streaming engine accepts the full
infer kwarg set — src/inference/streaming.jl:536-845; tests mirror
test/inference/inference_tests.jl:752-1534)."""

import numpy as np
import pytest

import rxinfer_tpu as rx


def _step_model():
    @rx.model
    def step(y, pa, pb):
        theta = rx.Beta(pa, pb)
        y.observe(rx.Bernoulli(theta))
        return {"theta": theta}

    return step


def _au():
    return rx.autoupdates(
        initial={"pa": 1.0, "pb": 1.0},
        pa=lambda q: q["theta"].a,
        pb=lambda q: q["theta"].b,
    )


def _gauss_step():
    @rx.model
    def step(y, pm, pv):
        x = rx.Normal(mean=pm, var=pv)
        tau = rx.Gamma(shape=2.0, rate=2.0)
        y.observe(rx.Normal(mean=x, precision=tau))
        return {"x": x, "tau": tau}

    return step


def _gauss_au():
    return rx.autoupdates(
        initial={"pm": 0.0, "pv": 10.0},
        pm=lambda q: q["x"].mean(),
        pv=lambda q: q["x"].var(),
    )


def test_streaming_per_iteration_callbacks_and_stop_iteration():
    """Registering before/after_iteration switches the tick to host-loop mode:
    the pairs fire PER VMP ITERATION and stop_iteration ends the loop early
    (reference streaming.jl:349-407)."""
    from rxinfer_tpu.dists import GammaShapeRate

    iters_seen = []

    def on_after(ev):
        iters_seen.append(ev.payload["iteration"])
        if ev.payload["iteration"] == 2:
            ev.stop_iteration = True

    eng = rx.infer(
        model=_gauss_step(), datastream=None, autoupdates=_gauss_au(),
        iterations=10, free_energy=True,
        initialization={"tau": GammaShapeRate(2.0, 2.0)},
        callbacks={"after_iteration": on_after},
    )
    eng.on_next({"y": np.float32(1.0)})
    assert iters_seen == [0, 1, 2]  # stopped early out of 10
    # next tick starts a fresh loop
    eng.on_next({"y": np.float32(0.5)})
    assert iters_seen == [0, 1, 2, 0, 1, 2]


def test_streaming_historyvars_keepeach_vs_keeplast():
    from rxinfer_tpu.dists import GammaShapeRate

    eng = rx.infer(
        model=_gauss_step(), datastream=[{"y": np.float32(v)}
                                         for v in (1.0, 0.5, 2.0)],
        autoupdates=_gauss_au(), iterations=4,
        initialization={"tau": GammaShapeRate(2.0, 2.0)},
        keephistory=2,
        historyvars={"x": rx.KeepEach(), "tau": rx.KeepLast()},
    )
    assert len(eng.history) == 2  # buffer bound
    entry = eng.history[-1]
    assert isinstance(entry["x"], list) and len(entry["x"]) == 4
    assert not isinstance(entry["tau"], list)


def test_streaming_historyvars_without_keephistory_warns():
    with pytest.warns(UserWarning, match="keephistory"):
        rx.infer(
            model=_step_model(), datastream=[{"y": np.float32(1.0)}],
            autoupdates=_au(), historyvars=rx.KeepEach(),
        )


def test_streaming_returnvars_selects_posteriors():
    eng = rx.infer(
        model=_gauss_step(), datastream=[{"y": np.float32(1.0)}],
        autoupdates=_gauss_au(),
        initialization={"tau": __import__(
            "rxinfer_tpu").dists.GammaShapeRate(2.0, 2.0)},
        returnvars=["x"],
    )
    assert set(eng.posteriors) == {"x"}


def test_streaming_constraints_and_meta_forwarded():
    """constraints= must reach the compiled model (a bogus constraint name
    raises through the streaming path, proving it is not dropped)."""
    with pytest.raises(ValueError, match="unknown variables"):
        rx.infer(
            model=_step_model(), datastream=[{"y": np.float32(1.0)}],
            autoupdates=_au(),
            constraints=rx.constraints(factorization=[("nope", "theta")]),
        )


def test_streaming_postprocess_and_annotations():
    from rxinfer_tpu.postprocess import Marginal

    eng = rx.infer(
        model=_step_model(), datastream=[{"y": np.float32(1.0)}],
        autoupdates=_au(), free_energy=True,
        annotations=rx.LogScaleAnnotations(),
    )
    post = eng.posteriors["theta"]
    assert isinstance(post, Marginal)
    assert np.isfinite(float(rx.getlogscale(post)))

    # custom postprocess strategy applies per tick
    eng2 = rx.infer(
        model=_step_model(), datastream=[{"y": np.float32(1.0)}],
        autoupdates=_au(),
        postprocess=lambda d: ("wrapped", d),
    )
    tag, _ = eng2.posteriors["theta"]
    assert tag == "wrapped"


def test_streaming_benchmark_and_trace():
    eng = rx.infer(
        model=_step_model(),
        datastream=[{"y": np.float32(v)} for v in (1.0, 0.0)],
        autoupdates=_au(), benchmark=True, trace=True,
    )
    assert len(eng.benchmark.timestamps["on_tick"]) == 2
    d = eng.benchmark.durations_ms("before_data_update", "after_data_update")
    assert len(d) == 2 and (d >= 0).all()
    names = [e.name for e in eng.trace.events]
    assert "on_new_data" in names and "on_tick" in names


def test_streaming_catch_exception_rejected():
    with pytest.raises(ValueError, match="batch-only"):
        rx.infer(
            model=_step_model(), datastream=[{"y": np.float32(1.0)}],
            autoupdates=_au(), catch_exception=True,
        )


def test_streaming_session_logged():
    from rxinfer_tpu.utils.session import get_default_session

    sess = get_default_session()
    n0 = sess.get_session_stats("streaming_inference").total
    rx.infer(
        model=_step_model(), datastream=[{"y": np.float32(1.0)}],
        autoupdates=_au(),
    )
    assert sess.get_session_stats("streaming_inference").total == n0 + 1


def test_batch_returnvars_per_variable_dict():
    """returnvars dict selects AND shapes posteriors per variable
    (reference src/inference/inference.jl:18-21, batch.jl:259-276)."""
    from rxinfer_tpu.dists import GammaShapeRate

    rng = np.random.default_rng(0)
    y = (3.0 + 0.5 * rng.standard_normal(100)).astype(np.float32)

    @rx.model
    def gauss(y):
        mu = rx.Normal(mean=0.0, var=100.0)
        tau = rx.Gamma(shape=0.01, rate=0.01)
        for i in rx.plate(len(y)):
            y[i] = rx.Normal(mean=mu, precision=tau)
        return {"mu": mu, "tau": tau}

    res = rx.infer(
        model=gauss, data={"y": y}, iterations=8,
        initialization={"tau": GammaShapeRate(0.01, 0.01)},
        returnvars={"mu": rx.KeepEach(), "tau": rx.KeepLast()},
    )
    assert set(res.posteriors) == {"mu", "tau"}
    assert isinstance(res.posteriors["mu"], list)
    assert len(res.posteriors["mu"]) == 8
    assert not isinstance(res.posteriors["tau"], list)
    assert abs(float(res.posteriors["mu"][-1].mean()) - 3.0) < 0.2

    with pytest.warns(UserWarning, match="unknown variables"):
        rx.infer(
            model=gauss, data={"y": y}, iterations=2,
            initialization={"tau": GammaShapeRate(0.01, 0.01)},
            returnvars={"mu": rx.KeepLast(), "nope": rx.KeepLast()},
        )


def test_batch_keephistory_warns_streaming_only():
    @rx.model
    def m(y):
        mu = rx.Normal(mean=0.0, var=1.0)
        y.observe(rx.Normal(mean=mu, var=1.0))
        return {"mu": mu}

    with pytest.warns(UserWarning, match="streaming-only"):
        rx.infer(model=m, data={"y": np.float32(0.2)}, keephistory=5)
