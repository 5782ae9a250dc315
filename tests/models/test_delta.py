"""Nonlinear (delta-node) models — Linearization / Unscented / known inverse
(reference: test/models/nonlinear suites, docs/src/manuals/inference/delta-node.md)."""

import numpy as np
import jax.numpy as jnp

import rxinfer_tpu as rx
from rxinfer_tpu.dists import NormalMeanVariance
from rxinfer_tpu.rules.delta import Linearization, Unscented


def test_linear_fn_is_exact():
    """Delta with a LINEAR fn must reproduce the exact conjugate posterior."""
    rng = np.random.default_rng(0)
    n = 50
    theta_true = 1.7
    y = (2.0 * theta_true + 1.0 + 0.5 * rng.standard_normal(n)).astype(np.float32)

    @rx.model
    def m(y):
        theta = rx.Normal(mean=0.0, var=10.0)
        for i in rx.plate(n):
            y[i] = rx.Normal(mean=rx.Delta(lambda t: 2.0 * t + 1.0, theta), var=0.25)
        return {"theta": theta}

    res = rx.infer(returnvars=rx.KeepLast(), 
        model=m, data={"y": y}, iterations=5,
        initialization={"theta": NormalMeanVariance(0.0, 10.0)},
    )
    q = res.posteriors["theta"]
    # analytic: w = 1/10 + n*4/0.25 ; m = (sum 2*(y-1)/0.25) / w
    w = 1 / 10 + n * 4.0 / 0.25
    mexp = (2.0 * (y - 1.0) / 0.25).sum() / w
    assert np.isclose(float(q.mean()), mexp, rtol=1e-4)
    assert np.isclose(float(q.precision()), w, rtol=1e-4)


def test_nonlinear_linearization_converges():
    """y = sin(theta) + noise; iterated linearization should find theta near the
    true value (IEKF fixed point)."""
    rng = np.random.default_rng(1)
    n = 200
    theta_true = 0.6
    y = (np.sin(theta_true) + 0.1 * rng.standard_normal(n)).astype(np.float32)

    @rx.model
    def m(y):
        theta = rx.Normal(mean=0.3, var=1.0)
        for i in rx.plate(n):
            y[i] = rx.Normal(
                mean=rx.Delta(jnp.sin, theta, method=Linearization()), var=0.01
            )
        return {"theta": theta}

    res = rx.infer(returnvars=rx.KeepLast(), 
        model=m, data={"y": y}, iterations=25,
        initialization={"theta": NormalMeanVariance(0.3, 1.0)},
    )
    est = float(res.posteriors["theta"].mean())
    assert abs(np.sin(est) - y.mean()) < 0.01
    assert abs(est - theta_true) < 0.05


def test_unscented_multi_input():
    """Two-input nonlinearity z = a * exp(b) (reference multi-input delta)."""
    rng = np.random.default_rng(2)
    n = 300
    a_true, b_true = 2.0, 0.5
    z_true = a_true * np.exp(b_true)
    y = (z_true + 0.2 * rng.standard_normal(n)).astype(np.float32)

    @rx.model
    def m(y):
        a = rx.Normal(mean=1.5, var=1.0)
        b = rx.Normal(mean=0.3, var=1.0)
        for i in rx.plate(n):
            y[i] = rx.Normal(
                mean=rx.Delta(lambda aa, bb: aa * jnp.exp(bb), a, b,
                              method=Unscented()),
                var=0.04,
            )
        return {"a": a, "b": b}

    res = rx.infer(returnvars=rx.KeepLast(), 
        model=m, data={"y": y}, iterations=30,
        initialization={"a": NormalMeanVariance(1.5, 1.0),
                        "b": NormalMeanVariance(0.3, 1.0)},
    )
    a_est = float(res.posteriors["a"].mean())
    b_est = float(res.posteriors["b"].mean())
    # the product a*exp(b) is identifiable, individual factors only weakly
    assert abs(a_est * np.exp(b_est) - z_true) < 0.15


def test_mv_nonlinear():
    """Vector-valued nonlinearity through MvNormal emission."""
    rng = np.random.default_rng(3)
    n = 150
    x_true = np.array([0.8, -0.4], dtype=np.float32)

    def f(v):
        return jnp.stack([jnp.tanh(v[0]), v[1] ** 3 + v[0]])

    f_np = lambda v: np.array([np.tanh(v[0]), v[1] ** 3 + v[0]])
    y = (f_np(x_true) + 0.1 * rng.standard_normal((n, 2))).astype(np.float32)

    @rx.model
    def m(y):
        x = rx.MvNormal(mean=np.zeros(2, np.float32), cov=np.eye(2, dtype=np.float32))
        for i in rx.plate(n):
            y[i] = rx.MvNormal(
                mean=rx.Delta(f, x, method=Linearization()),
                cov=0.01 * np.eye(2, dtype=np.float32),
            )
        return {"x": x}

    from rxinfer_tpu.dists import MvNormalMeanCovariance

    res = rx.infer(returnvars=rx.KeepLast(), 
        model=m, data={"y": y}, iterations=30,
        initialization={
            "x": MvNormalMeanCovariance(np.zeros(2, np.float32),
                                        np.eye(2, dtype=np.float32))
        },
    )
    est = np.asarray(res.posteriors["x"].mean())
    np.testing.assert_allclose(f_np(est), y.mean(0), atol=0.05)


def test_static_inputs_two_arg_delta():
    """Delta with one random and one static input (reference:
    test/models/nonlinear/static_inputs_tests.jl — f2(x, theta) = x .+ theta
    with theta fixed, both as constant and as data), under Linearization and
    Unscented, with exact-FE cross-check (the model is linear → tree-exact)."""
    import numpy as np
    import rxinfer_tpu as rx
    from rxinfer_tpu.rules.delta import Linearization, Unscented

    theta = np.array([0.3, -0.2], np.float32)
    c = np.array([1.0, 0.0], np.float32)
    yv = np.asarray(1.2, np.float32)

    def f2(x, th):
        return x + th

    def build(theta_as_data):
        @rx.model
        def m(y, th=None):
            x = rx.MvNormal(mean=np.zeros(2, np.float32),
                            prec=np.eye(2, dtype=np.float32))
            tharg = th if theta_as_data else theta
            z = rx.Delta(f2, x, tharg, method=m.method)
            w = rx.Normal(mean=rx.dot(c, z), var=1.0)
            y.observe(rx.Normal(mean=w, variance=0.5))
            return {"x": x, "w": w}

        return m

    v_tot = 1.0 + 1.0 + 0.5
    mx_exact = (float(yv) - theta[0]) / v_tot
    fe_exact = 0.5 * np.log(2 * np.pi * v_tot) + (float(yv) - theta[0]) ** 2 / (
        2 * v_tot
    )
    for method in (Linearization(), Unscented()):
        for theta_as_data in (False, True):
            gen = build(theta_as_data)
            gen.method = method  # closure hook
            data = {"y": yv}
            if theta_as_data:
                data["th"] = theta
            res = rx.infer(returnvars=rx.KeepLast(), model=gen, data=data, iterations=8,
                           free_energy=True)
            q = res.posteriors["x"]
            # Linearization is exact; Unscented (alpha=1e-3 defaults) leaves
            # ~1% float32 sigma-point arithmetic noise at the vague-init scale
            atol = 2e-3 if isinstance(method, Linearization) else 1.5e-2
            np.testing.assert_allclose(
                np.asarray(q.mean()), [mx_exact, 0.0], atol=atol
            )
            fe = float(np.asarray(res.free_energy)[-1])
            assert abs(fe - fe_exact) < 10 * atol, (
                method, theta_as_data, fe, fe_exact
            )
