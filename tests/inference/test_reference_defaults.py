"""returnvars/predictvars reference-default derivation
(src/inference/batch.jl:202-269) — each branch of the reference's logic:

- returnvars omitted + `iterations` a number  → KeepEach for every variable
- returnvars omitted + iterations omitted     → KeepLast
- predictvars as a global KeepEach()/KeepLast() → applies to every data var
- predictvars omitted + data containing missing (NaN) → auto-derived with
  KeepEach when iterations is a number
- predictvars dict: missing-data entries not named are injected
"""

import numpy as np
import pytest

import rxinfer_tpu as rx
from rxinfer_tpu.dists import GammaShapeRate


def _gauss_model(n):
    @rx.model
    def gauss(y):
        mu = rx.Normal(mean=0.0, var=100.0)
        tau = rx.Gamma(shape=0.01, rate=0.01)
        for i in rx.plate(n):
            y[i] = rx.Normal(mean=mu, precision=tau)
        return {"mu": mu, "tau": tau}

    return gauss


def _data(n=40, seed=0):
    rng = np.random.default_rng(seed)
    return (1.5 + 0.5 * rng.standard_normal(n)).astype(np.float32)


_INIT = {"tau": GammaShapeRate(0.01, 0.01)}


def test_returnvars_default_keepeach_when_iterations_given():
    """batch.jl:259-269: `iterations isa Number` → KeepEach default."""
    y = _data()
    res = rx.infer(model=_gauss_model(len(y)), data={"y": y}, iterations=7,
                   initialization=_INIT)
    assert isinstance(res.posteriors["mu"], list)
    assert len(res.posteriors["mu"]) == 7
    # per-iteration marginals converge toward the final one
    m_last = float(res.posteriors["mu"][-1].mean())
    assert abs(m_last - y.mean()) < 0.1


def test_returnvars_default_keeplast_without_iterations():
    y = _data()
    res = rx.infer(model=_gauss_model(len(y)), data={"y": y},
                   initialization=_INIT)
    assert not isinstance(res.posteriors["mu"], list)


def test_returnvars_explicit_keeplast_with_iterations():
    y = _data()
    res = rx.infer(model=_gauss_model(len(y)), data={"y": y}, iterations=7,
                   returnvars=rx.KeepLast(), initialization=_INIT)
    assert not isinstance(res.posteriors["mu"], list)


def _lgssm(T):
    @rx.model
    def ssm(y):
        x = rx.latent(T, name="x")
        x[0] = rx.Normal(mean=0.0, var=10.0)
        for t in rx.plate(1, T):
            x[t] = rx.Normal(mean=x[t - 1], var=1.0)
        for t in rx.plate(T):
            y[t] = rx.Normal(mean=x[t], var=0.5)
        return {"x": x}

    return ssm


def test_predictvars_derived_from_missing_data():
    """batch.jl:221-227: data entries with missing values derive predictvars
    automatically (KeepEach when iterations is numeric)."""
    T = 12
    rng = np.random.default_rng(1)
    y = np.cumsum(rng.standard_normal(T)).astype(np.float32)
    y[5] = np.nan
    res = rx.infer(model=_lgssm(T), data={"y": y}, iterations=3,
                   returnvars=rx.KeepLast())
    assert "y" in res.predictions
    assert isinstance(res.predictions["y"], list)  # KeepEach derived
    assert len(res.predictions["y"]) == 3
    # the prediction at the missing slot tracks the smoothed state
    pred = res.predictions["y"][-1]
    x_post = res.posteriors["x"]
    assert abs(float(np.asarray(pred.mean())[5])
               - float(np.asarray(x_post.mean())[5])) < 1e-4

    # without explicit iterations the derived option is KeepLast
    res2 = rx.infer(model=_lgssm(T), data={"y": y})
    assert "y" in res2.predictions
    assert not isinstance(res2.predictions["y"], list)


def test_predictvars_global_keepoption_applies_to_all_data():
    """batch.jl:203-214: predictvars=KeepLast() expands over every data var."""
    T = 10
    rng = np.random.default_rng(2)
    y = np.cumsum(rng.standard_normal(T)).astype(np.float32)
    res = rx.infer(model=_lgssm(T), data={"y": y},
                   predictvars=rx.KeepLast())
    assert set(res.predictions) == {"y"}
    assert not isinstance(res.predictions["y"], list)


def test_predictvars_dict_injection_of_missing_entries():
    """batch.jl:230-245: a dict predictvars gets missing-data entries
    injected with the default option."""
    T = 10
    rng = np.random.default_rng(3)
    y = np.cumsum(rng.standard_normal(T)).astype(np.float32)
    y[2] = np.nan
    # dict names no vars; the NaN-bearing y is injected (iterations numeric →
    # KeepEach)
    res = rx.infer(model=_lgssm(T), data={"y": y}, iterations=2,
                   returnvars=rx.KeepLast(), predictvars={})
    assert "y" in res.predictions and isinstance(res.predictions["y"], list)


def test_predictvars_absent_data_var_errors_pointedly():
    T = 6
    y = np.zeros(T, np.float32)
    with pytest.raises(ValueError, match="all-NaN"):
        rx.infer(model=_lgssm(T), data={"y": y}, predictvars={"z": rx.KeepLast()})


def test_getreturnval_and_success_flags():
    """Arbitrary @model return values are kept on the model
    (`getreturnval(result.model)`), and issuccess/iserror mirror the
    reference (test/inference/inference_tests.jl:339-430)."""
    import numpy as np

    @rx.model
    def m(y):
        x = rx.Normal(mean=0.0, var=1.0)
        for i in rx.plate(len(y)):
            y[i] = rx.Normal(mean=x, var=1.0)
        return len(y), 2, 3.0, "hello world"

    for n in (2, 5):
        y = np.zeros(n, np.float32)
        res = rx.infer(model=m, data={"y": y}, returnvars=rx.KeepLast())
        assert rx.getreturnval(res.model) == (n, 2, 3.0, "hello world")
        assert rx.issuccess(res) and not rx.iserror(res)

    # catch_exception failure path flips the flags
    @rx.model
    def bad(y):
        x = rx.Normal(mean=0.0, var=1.0)
        y.observe(rx.Normal(mean=x, var=1.0))
        return {"x": x}

    def boom(event):
        raise RuntimeError("bang!")

    res = rx.infer(model=bad, data={"y": np.float32(0.0)}, iterations=3,
                   catch_exception=True,
                   callbacks={"after_iteration": boom})
    assert rx.iserror(res) and not rx.issuccess(res)
    assert "bang!" in str(res.error)
