"""Data-variable arithmetic folds automatically.

Mirrors /root/reference/test/models/models_tests.jl:221+ ("Data variables
should fold automatically"): `x ~ Normal(mean = a + b + 1 - 1, precision =
1.0)` with data-valued a, b must build a folded (derived) data interface, and
the posterior/free energy match the reference's asserted values (mean ≈ 1.5,
FE ≈ 3.51551 at a=2, b=1, y=0)."""

import numpy as np
import pytest

import rxinfer_tpu as rx


def _run(modelfn):
    return rx.infer(
        model=modelfn,
        data={"a": np.float32(2.0), "b": np.float32(1.0), "y": np.float32(0.0)},
        returnvars=rx.KeepLast(), free_energy=True,
    )


def test_sum_datavars_as_gaussian_mean_1():
    @rx.model
    def m(y, a, b):
        x = rx.Normal(mean=a + b + 1 - 1, precision=1.0)
        y.observe(rx.Normal(mean=x, var=1.0))
        return {"x": x}

    res = _run(m)
    assert float(res.posteriors["x"].mean()) == pytest.approx(1.5, abs=0.1)
    assert float(np.asarray(res.free_energy)[-1]) == pytest.approx(3.51551, abs=0.1)


def test_sum_datavars_as_gaussian_mean_2():
    @rx.model
    def m(y, a, b):
        c = 1.0
        x = rx.Normal(mean=(a + b) + c - c, var=1.0)
        y.observe(rx.Normal(mean=x, var=1.0))
        return {"x": x}

    res = _run(m)
    assert float(res.posteriors["x"].mean()) == pytest.approx(1.5, abs=0.1)
    assert float(np.asarray(res.free_energy)[-1]) == pytest.approx(3.51551, abs=0.1)


def test_indexed_datavar_sum():
    """v[1] + v[2] (indexed data refs through the Sum node path),
    models_tests.jl sum_datavars_as_gaussian_mean_3."""

    @rx.model
    def m(y, v):
        x = rx.Normal(mean=v[0] + v[1], precision=1.0)
        y.observe(rx.Normal(mean=x, var=1.0))
        return {"x": x}

    res = rx.infer(
        model=m,
        data={"v": np.array([2.0, 1.0], np.float32), "y": np.float32(0.0)},
        returnvars=rx.KeepLast(), free_energy=True,
    )
    assert float(res.posteriors["x"].mean()) == pytest.approx(1.5, abs=0.1)


def test_fold_mul_div_neg():
    """Products/quotients/negation fold too; posterior mean of x under prior
    N(m0, 1) and likelihood N(x|y=0, 1) is m0/2."""

    @rx.model
    def m(y, a, b):
        x = rx.Normal(mean=(a * b + (-b) + b / b) / 1.0, precision=1.0)
        y.observe(rx.Normal(mean=x, var=1.0))
        return {"x": x}

    # a*b - b + 1 = 6 - 2 + 1 = 5  -> posterior mean 2.5
    res = rx.infer(
        model=m,
        data={"a": np.float32(3.0), "b": np.float32(2.0), "y": np.float32(0.0)},
        returnvars=rx.KeepLast(),
    )
    assert float(res.posteriors["x"].mean()) == pytest.approx(2.5, abs=1e-4)


def test_infer_batched_applies_data_folding():
    """infer_batched resolves folded (derived) data expressions too: the
    batched sweep/plan path must apply CompiledModel._with_derived so the
    '_fold*' derived variables exist per batch element (round-3 advisor
    finding — previously a KeyError)."""

    @rx.model
    def m(y, a, b):
        x = rx.Normal(mean=a + b, precision=1.0)
        y.observe(rx.Normal(mean=x, var=1.0))
        return {"x": x}

    a = np.array([2.0, -1.0, 0.5, 3.0], np.float32)
    b = np.array([2.0, 1.0, 0.5, -1.0], np.float32)
    y = np.zeros(4, np.float32)
    res = rx.infer_batched(m, data={"a": a, "b": b, "y": y},
                           free_energy=True)
    posts, fe = res
    means = np.asarray(posts["x"].mean())
    np.testing.assert_allclose(means, (a + b) / 2.0, atol=1e-4)
    # matches the single-program path element-wise
    for i in range(4):
        ri = rx.infer(model=m, data={"a": a[i], "b": b[i], "y": y[i]},
                      returnvars=rx.KeepLast(), free_energy=True)
        assert float(means[i]) == pytest.approx(
            float(ri.posteriors["x"].mean()), abs=1e-4)
        assert float(np.asarray(fe)[-1, i]) == pytest.approx(
            float(np.asarray(ri.free_energy)[-1]), abs=1e-4)


def test_fold_changes_with_runtime_data():
    """The fold is evaluated from the RUNTIME data dict (not baked at trace
    time): the same compiled model gives different answers for different
    a/b values."""

    @rx.model
    def m(y, a, b):
        x = rx.Normal(mean=a + b, precision=1.0)
        y.observe(rx.Normal(mean=x, var=1.0))
        return {"x": x}

    r1 = rx.infer(model=m, data={"a": np.float32(2.0), "b": np.float32(2.0),
                                 "y": np.float32(0.0)}, returnvars=rx.KeepLast())
    r2 = rx.infer(model=m, data={"a": np.float32(-1.0), "b": np.float32(1.0),
                                 "y": np.float32(0.0)}, returnvars=rx.KeepLast())
    assert float(r1.posteriors["x"].mean()) == pytest.approx(2.0, abs=1e-4)
    assert float(r2.posteriors["x"].mean()) == pytest.approx(0.0, abs=1e-4)
