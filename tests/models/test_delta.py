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
            # a few percent of float32 sigma-point arithmetic noise in the
            # unconstrained dimension (the exact level shifts with the
            # PSD-guard ridge and the ancestral init trajectory)
            atol = 2e-3 if isinstance(method, Linearization) else 4e-2
            np.testing.assert_allclose(
                np.asarray(q.mean()), [mx_exact, 0.0], atol=atol
            )
            fe = float(np.asarray(res.free_energy)[-1])
            assert abs(fe - fe_exact) < 10 * atol, (
                method, theta_as_data, fe, fe_exact
            )


def test_known_inverse_single_arg():
    """DeltaMeta(inverse=...) on a 1-input delta: the backward message is the
    out-message pushed through fn⁻¹ (reference delta-node.md:60-77).  On a
    monotone smooth fn both the inverse path and the joint-conditioning path
    approximate the same posterior."""
    rng = np.random.default_rng(3)
    n = 100
    theta_true = 0.8
    y = (np.exp(theta_true) + 0.1 * rng.standard_normal(n)).astype(np.float32)

    def build(inverse):
        @rx.model
        def m(y):
            theta = rx.Normal(mean=0.0, var=2.0)
            for i in rx.plate(n):
                y[i] = rx.Normal(
                    mean=rx.Delta(jnp.exp, theta, method=Linearization(),
                                  inverse=inverse),
                    var=0.01,
                )
            return {"theta": theta}

        return m

    calls = {"n": 0}

    def loginv(out):
        calls["n"] += 1  # trace-time proof the inverse path is taken
        return jnp.log(out)

    kw = dict(data={"y": y}, iterations=20, returnvars=rx.KeepLast(),
              initialization={"theta": NormalMeanVariance(0.5, 1.0)})
    res_inv = rx.infer(model=build(loginv), **kw)
    assert calls["n"] > 0, "inverse= was never invoked"
    res_no = rx.infer(model=build(None), **kw)
    est_inv = float(res_inv.posteriors["theta"].mean())
    est_no = float(res_no.posteriors["theta"].mean())
    assert abs(est_inv - theta_true) < 0.05, est_inv
    assert abs(est_inv - est_no) < 0.05, (est_inv, est_no)


def test_known_inverse_multi_arg():
    """The reference's multi-arg inverse tuple (delta-node.md:107-117):
    f(x, g) = x * tanh(g) with f_back_x(out, g) = out / tanh(g) and
    f_back_g(out, x) = atanh(out / x)."""
    rng = np.random.default_rng(4)
    n = 80
    x_true, g_true = 1.4, 0.9
    z = (x_true * np.tanh(g_true)
         + 0.05 * rng.standard_normal(n)).astype(np.float32)

    def f(x, g):
        return x * jnp.tanh(g)

    calls = {"x": 0, "g": 0}

    def f_back_x(out, g):
        calls["x"] += 1  # trace-time proof the inverse path is taken
        return out / jnp.tanh(g)

    def f_back_g(out, x):
        calls["g"] += 1
        return jnp.arctanh(jnp.clip(out / x, -0.999, 0.999))

    def build(inverse):
        @rx.model
        def m(z):
            x = rx.Normal(mean=1.0, var=1.0)
            g = rx.Normal(mean=1.0, var=1.0)
            for i in rx.plate(n):
                z[i] = rx.Normal(
                    mean=rx.Delta(f, x, g, method=Linearization(),
                                  inverse=inverse),
                    var=0.01,
                )
            return {"x": x, "g": g}

        return m

    init = {"x": NormalMeanVariance(1.0, 1.0),
            "g": NormalMeanVariance(1.0, 1.0)}
    kw = dict(data={"z": z}, iterations=30, returnvars=rx.KeepLast(),
              initialization=init)
    res_inv = rx.infer(model=build((f_back_x, f_back_g)), **kw)
    assert calls["x"] > 0 and calls["g"] > 0, calls
    res_no = rx.infer(model=build(None), **kw)
    prod_inv = (float(res_inv.posteriors["x"].mean())
                * np.tanh(float(res_inv.posteriors["g"].mean())))
    prod_no = (float(res_no.posteriors["x"].mean())
               * np.tanh(float(res_no.posteriors["g"].mean())))
    # both paths must explain the data (the product is identified; the
    # factors individually are not)
    assert abs(prod_inv - z.mean()) < 0.05, prod_inv
    assert abs(prod_no - z.mean()) < 0.05, prod_no
    for name in ("x", "g"):
        v = float(res_inv.posteriors[name].var())
        assert np.isfinite(v) and v > 0


def test_inverse_wrong_arity_warns():
    """inverse= that cannot be applied must WARN, not be silently ignored
    (round-3 verdict)."""
    import pytest

    rng = np.random.default_rng(5)
    n = 10
    z = (0.5 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    @rx.model
    def m(z):
        x = rx.Normal(mean=0.0, var=1.0)
        g = rx.Normal(mean=0.0, var=1.0)
        for i in rx.plate(n):
            z[i] = rx.Normal(
                mean=rx.Delta(lambda a, b: a + b, x, g,
                              method=Linearization(),
                              inverse=lambda out: out),
                var=0.1,
            )
        return {"x": x, "g": g}

    init = {"x": NormalMeanVariance(0.0, 1.0),
            "g": NormalMeanVariance(0.0, 1.0)}
    with pytest.warns(UserWarning, match="inverse.*ignored|ignored"):
        rx.infer(model=m, data={"z": z}, iterations=2,
                 returnvars=rx.KeepLast(), initialization=init)


def test_known_inverse_uncontracted_delta():
    """Same known-inverse shortcut on the UNCONTRACTED Delta node (the user
    keeps a handle on the intermediate, so contraction is skipped)."""
    rng = np.random.default_rng(6)
    n = 60
    theta_true = 0.8
    y = (np.exp(theta_true) + 0.1 * rng.standard_normal(n)).astype(np.float32)
    calls = {"n": 0}

    def loginv(out):
        calls["n"] += 1
        return jnp.log(out)

    @rx.model
    def m(y):
        theta = rx.Normal(mean=0.0, var=2.0)
        for i in rx.plate(n):
            w = rx.Delta(jnp.exp, theta, method=Linearization(),
                         inverse=loginv)
            y[i] = rx.Normal(mean=w, var=0.01)
        return {"theta": theta, "w": w}

    res = rx.infer(model=m, data={"y": y}, iterations=20,
                   returnvars=rx.KeepLast(),
                   initialization={"theta": NormalMeanVariance(0.5, 1.0)})
    assert calls["n"] > 0, "inverse= was never invoked on the Delta node"
    est = float(res.posteriors["theta"].mean())
    assert abs(est - theta_true) < 0.05, est
