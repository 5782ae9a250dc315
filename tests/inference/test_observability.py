"""Callbacks, events, benchmark/trace instrumentation, early stopping,
KeepEach history, session logging, checkpointing (reference: src/callbacks/,
src/session.jl; SURVEY.md §5)."""

import numpy as np

import rxinfer_tpu as rx
from rxinfer_tpu.dists import GammaShapeRate
from rxinfer_tpu.utils.callbacks import StopEarlyIterationStrategy
from rxinfer_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def _model_and_data():
    rng = np.random.default_rng(0)
    y = (2.0 + 0.7 * rng.standard_normal(100)).astype(np.float32)

    @rx.model
    def gauss(y):
        mu = rx.Normal(mean=0.0, var=100.0)
        tau = rx.Gamma(shape=1.0, rate=1.0)
        for i in rx.plate(len(y)):
            y[i] = rx.Normal(mean=mu, precision=tau)
        return {"mu": mu, "tau": tau}

    return gauss, y


def test_iteration_callbacks_fire():
    gauss, y = _model_and_data()
    seen = []
    rx.infer(returnvars=rx.KeepLast(), 
        model=gauss, data={"y": y}, iterations=4,
        initialization={"tau": GammaShapeRate(1.0, 1.0)},
        callbacks={"after_iteration": lambda ev: seen.append(ev.payload["iteration"])},
    )
    assert seen == [0, 1, 2, 3]


def test_early_stopping():
    gauss, y = _model_and_data()
    stopper = StopEarlyIterationStrategy(atol=1e-4)
    count = []
    res = rx.infer(returnvars=rx.KeepLast(), 
        model=gauss, data={"y": y}, iterations=50, free_energy=True,
        initialization={"tau": GammaShapeRate(1.0, 1.0)},
        callbacks={
            "after_iteration": lambda ev: (count.append(1), stopper(ev))[-1],
        },
    )
    # converges long before 50 iterations
    assert len(count) < 25
    assert len(np.asarray(res.free_energy)) == len(count)


def test_benchmark_and_trace():
    gauss, y = _model_and_data()
    res = rx.infer(returnvars=rx.KeepLast(), 
        model=gauss, data={"y": y}, iterations=3, free_energy=True,
        initialization={"tau": GammaShapeRate(1.0, 1.0)},
        benchmark=True, trace=True,
    )
    stats = res.benchmark.stats()
    assert stats["iteration"]["n"] == 3
    assert stats["iteration"]["mean_ms"] > 0
    names = [e.name for e in res.trace.traced()]
    assert names.count("before_iteration") == 3
    assert "before_inference" in names and "after_inference" in names


def test_keep_each_history():
    gauss, y = _model_and_data()
    res = rx.infer(
        model=gauss, data={"y": y}, iterations=5,
        initialization={"tau": GammaShapeRate(1.0, 1.0)},
        returnvars=rx.KeepEach(),
    )
    assert isinstance(res.posteriors["mu"], list)
    assert len(res.posteriors["mu"]) == 5
    # later iterations refine: last mean closer to sample mean than first
    m_first = float(res.posteriors["mu"][0].mean())
    m_last = float(res.posteriors["mu"][-1].mean())
    assert abs(m_last - y.mean()) <= abs(m_first - y.mean()) + 1e-5


def test_session_logging():
    gauss, y = _model_and_data()
    from rxinfer_tpu.utils.session import get_default_session

    before = get_default_session().get_session_stats("inference").total
    rx.infer(returnvars=rx.KeepLast(), model=gauss, data={"y": y}, iterations=1,
             initialization={"tau": GammaShapeRate(1.0, 1.0)})
    stats = get_default_session().get_session_stats("inference")
    assert stats.total == before + 1
    summary = rx.summarize_session()
    assert "inference" in summary


def test_checkpoint_roundtrip(tmp_path):
    gauss, y = _model_and_data()
    res = rx.infer(returnvars=rx.KeepLast(), model=gauss, data={"y": y}, iterations=5,
                   initialization={"tau": GammaShapeRate(1.0, 1.0)})
    path = str(tmp_path / "ckpt.pkl")
    save_checkpoint(path, res.posteriors)
    restored = load_checkpoint(path)
    assert np.isclose(float(restored["mu"].mean()),
                      float(res.posteriors["mu"].mean()))
    assert np.isclose(float(restored["tau"].a), float(res.posteriors["tau"].a))


def test_convert_to_tensorboard(tmp_path):
    """TB export writes event files (reference TensorBoardLoggerExt)."""
    import os

    import numpy as np

    import rxinfer_tpu as rx

    @rx.model
    def coin(y):
        theta = rx.Beta(1.0, 1.0)
        for i in rx.plate(len(y)):
            y[i] = rx.Bernoulli(theta)
        return {"theta": theta}

    y = np.array([1.0, 0.0, 1.0], np.float32)
    res = rx.infer(returnvars=rx.KeepLast(), model=coin, data={"y": y}, iterations=3, trace=True,
                   free_energy=True)
    logdir = str(tmp_path / "tb")
    rx.convert_to_tensorboard(res.trace, logdir)
    files = os.listdir(logdir)
    assert any("tfevents" in f for f in files)


def test_benchmark_table_and_session_table():
    import numpy as np

    import rxinfer_tpu as rx

    @rx.model
    def coin(y):
        theta = rx.Beta(1.0, 1.0)
        for i in rx.plate(len(y)):
            y[i] = rx.Bernoulli(theta)
        return {"theta": theta}

    y = np.array([1.0, 0.0, 1.0], np.float32)
    res = rx.infer(returnvars=rx.KeepLast(), model=coin, data={"y": y}, iterations=3, benchmark=True)
    table = rx.benchmark_table(res.benchmark)
    assert "stage" in table and "median ms" in table and "inference" in table
    assert rx.summarize_session_table()  # non-empty string


def test_streaming_uselock_serializes_ticks():
    import threading

    import numpy as np

    import rxinfer_tpu as rx
    from rxinfer_tpu.dists import NormalMeanVariance

    @rx.model
    def step(y, pm, pv):
        x = rx.Normal(mean=pm, var=pv)
        y.observe(rx.Normal(mean=x, var=1.0))
        return {"x": x}

    au = rx.autoupdates(
        initial={"pm": 0.0, "pv": 100.0},
        pm=lambda q: q["x"].mean(),
        pv=lambda q: q["x"].var(),
    )
    engine = rx.infer(model=step, datastream=None, autoupdates=au,
                      uselock=True)
    assert engine._lock is not None
    rng = np.random.default_rng(0)
    obs = [{"y": np.float32(v)} for v in rng.standard_normal(24) + 2.0]
    # hammer on_next from several threads: the lock serializes ticks so every
    # observation is consumed exactly once (reference `uselock` SpinLock)
    chunks = [obs[i::4] for i in range(4)]
    threads = [threading.Thread(target=lambda c=c: [engine.on_next(o) for o in c])
               for c in chunks]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sum(1 for e in engine.events if e.name == "on_tick") == len(obs)
    assert abs(float(engine.posteriors["x"].mean()) - 2.0) < 1.0


def test_trace_messages_records_schedule():
    import numpy as np

    import rxinfer_tpu as rx

    @rx.model
    def coin(y):
        theta = rx.Beta(1.0, 1.0)
        for i in rx.plate(len(y)):
            y[i] = rx.Bernoulli(theta)
        return {"theta": theta}

    y = np.array([1.0, 0.0, 1.0], np.float32)
    with rx.trace_messages() as mt:
        rx.infer(returnvars=rx.KeepLast(), model=coin, data={"y": y}, iterations=2)
    nodes = {r["node"] for r in mt.records}
    assert "Bernoulli" in nodes or "Beta" in nodes, nodes
    assert all("interface" in r for r in mt.records)
    # recorder detaches outside the block (contextvar restored)
    assert rx.trace_messages._active.get() is None


def test_infer_batched_over_datasets():
    """infer_batched: one vmapped program over B independent datasets."""
    import numpy as np

    import rxinfer_tpu as rx
    from rxinfer_tpu.dists import GammaShapeRate

    rng = np.random.default_rng(0)
    B, n = 6, 80
    true_mu = np.linspace(-2.0, 3.0, B).astype(np.float32)
    y = (true_mu[:, None] + 0.3 * rng.standard_normal((B, n))).astype(np.float32)

    @rx.model
    def gauss(y):
        mu = rx.Normal(mean=0.0, var=100.0)
        tau = rx.Gamma(shape=0.01, rate=0.01)
        for i in rx.plate(n):
            y[i] = rx.Normal(mean=mu, precision=tau)
        return {"mu": mu, "tau": tau}

    posts, fe = rx.infer_batched(
        gauss, {"y": y}, iterations=15, free_energy=True,
        initialization={"tau": GammaShapeRate(0.01, 0.01)},
    )
    mus = np.asarray(posts["mu"].mean())
    assert mus.shape == (B,)
    np.testing.assert_allclose(mus, true_mu, atol=0.15)
    # per-iteration FE history: (iterations, B), non-increasing per dataset
    assert fe.shape == (15, B) and np.isfinite(np.asarray(fe)).all()
    assert (np.diff(np.asarray(fe), axis=0)
            <= 1e-4 * np.abs(np.asarray(fe[0]))).all()


def test_unknown_inference_option_raises():
    import numpy as np

    import pytest

    import rxinfer_tpu as rx

    @rx.model
    def m(y):
        mu = rx.Normal(mean=0.0, var=1.0)
        y.observe(rx.Normal(mean=mu, var=1.0))
        return {"mu": mu}

    with pytest.raises(ValueError, match="Unknown inference options"):
        rx.infer(model=m, data={"y": np.float32(0.2)},
                 options={"nope": 1})
    # reference-accepted options that are no-ops here pass through
    res = rx.infer(model=m, data={"y": np.float32(0.2)},
                   options={"limit_stack_depth": 100, "warn": False})
    assert np.isfinite(float(res.posteriors["mu"].mean()))
