"""Sum node, Uninformative prior, SoftDot, Mixture, catch_exception.

Reference parity: `+` deterministic node (src/model/graphppl.jl:58-83),
Uninformative node, SoftDot (docs/src/manuals/performance-tips.md), generic
Mixture(switch=...) (ReactiveMP v6), catch_exception
(src/inference/batch.jl:440-476).
"""

import numpy as np

import rxinfer_tpu as rx
from rxinfer_tpu.dists import (
    GammaShapeRate,
    MvNormalMeanCovariance,
    NormalMeanVariance,
)


def test_sum_node_tree_exact():
    """Tree graph a + b = s, y ~ N(s, 0.25): BP marginals must match the
    closed-form joint-Gaussian posterior (exact on trees)."""
    y_obs = 2.1
    prior_m = np.array([1.0, 0.5])
    prior_v = np.array([1.0, 2.0])

    @rx.model
    def m(y):
        a = rx.Normal(mean=1.0, var=1.0)
        b = rx.Normal(mean=0.5, var=2.0)
        for i in rx.plate(1):
            y[i] = rx.Normal(mean=a + b, var=0.25)
        return {"a": a, "b": b}

    res = rx.infer(returnvars=rx.KeepLast(), model=m, data={"y": np.array([y_obs], np.float32)},
                   iterations=10,
                   initialization={"a": NormalMeanVariance(1.0, 1.0),
                                   "b": NormalMeanVariance(0.5, 2.0)})

    # closed form: posterior precision = diag(1/v) + H^T H / 0.25, H = [1, 1]
    H = np.ones((1, 2))
    lam = np.diag(1.0 / prior_v) + H.T @ H / 0.25
    eta = prior_m / prior_v + H[0] * y_obs / 0.25
    mu = np.linalg.solve(lam, eta)
    sig = np.linalg.inv(lam)
    for i, name in enumerate(("a", "b")):
        assert abs(float(res.posteriors[name].mean()) - mu[i]) < 1e-3
        assert abs(float(res.posteriors[name].var()) - sig[i, i]) < 1e-3


def test_sum_node_shared_terms_loopy():
    """y_i ~ N(a + b, v) with both terms shared across the plate (loopy):
    the identifiable quantity a + b must converge to the conjugate result."""
    rng = np.random.default_rng(0)
    n = 200
    y = (1.5 + 0.5 * rng.standard_normal(n)).astype(np.float32)

    @rx.model
    def m(y):
        a = rx.Normal(mean=0.0, var=1.0)
        b = rx.Normal(mean=0.0, var=1.0)
        for i in rx.plate(n):
            y[i] = rx.Normal(mean=a + b, var=0.25)
        return {"a": a, "b": b}

    res = rx.infer(returnvars=rx.KeepLast(), 
        model=m, data={"y": y}, iterations=30,
        initialization={"a": NormalMeanVariance(0.0, 1.0),
                        "b": NormalMeanVariance(0.0, 1.0)},
    )
    # exact posterior of s = a+b: precision 1/2 + 4n, mean ≈ ȳ
    s_est = float(res.posteriors["a"].mean()) + float(res.posteriors["b"].mean())
    lam_s = 0.5 + 4.0 * n
    s_exact = 4.0 * y.sum() / lam_s
    assert abs(s_est - s_exact) < 0.05


def test_softdot_node_regression():
    """Time-varying regression y_t ~ N(theta^T x_t, 1/gamma): SoftDot with
    const design rows, random theta and gamma (canonical reference usage,
    docs/src/manuals/performance-tips.md)."""
    rng = np.random.default_rng(1)
    n, d = 300, 2
    theta_true = np.array([1.0, -0.5], np.float32)
    X = rng.standard_normal((n, d)).astype(np.float32)
    y = (X @ theta_true + 0.1 * rng.standard_normal(n)).astype(np.float32)

    @rx.model
    def m(phi, y):
        theta = rx.MvNormal(mean=np.zeros(d, np.float32),
                            cov=10.0 * np.eye(d, dtype=np.float32))
        g = rx.Gamma(shape=1.0, rate=1.0)
        for i in rx.plate(n):
            y[i] = rx.SoftDot(theta, phi[i], g)
        return {"theta": theta, "g": g}

    res = rx.infer(returnvars=rx.KeepLast(), 
        model=m, data={"phi": X, "y": y}, iterations=20,
        initialization={
            "theta": MvNormalMeanCovariance(np.zeros(d, np.float32),
                                            10.0 * np.eye(d, dtype=np.float32)),
            "g": GammaShapeRate(1.0, 1.0),
        },
        free_energy=True,
    )
    theta_est = np.asarray(res.posteriors["theta"].mean())
    assert np.allclose(theta_est, theta_true, atol=0.05)
    # noise precision 1/0.01 = 100 recovered within a factor
    g_est = float(res.posteriors["g"].mean())
    assert 50.0 < g_est < 200.0
    fe = np.asarray(res.free_energy)
    assert np.isfinite(fe).all()
    assert (np.diff(fe) <= 5e-5 * np.abs(fe[:-1]) + 1e-3).all(), fe  # monotone non-increase (f32 tolerance)


def test_softdot_shared_latent_x():
    """SoftDot with random x and OBSERVED theta (PointMass): q(x) along theta
    must match the conjugate 1-D projection."""
    rng = np.random.default_rng(2)
    n, d = 100, 2
    theta = np.array([1.0, -0.5], np.float32)
    x_true = np.array([0.8, 1.2], np.float32)
    s_true = float(theta @ x_true)
    y = (s_true + 0.1 * rng.standard_normal(n)).astype(np.float32)

    @rx.model
    def m(y):
        x = rx.MvNormal(mean=np.zeros(d, np.float32),
                        cov=4.0 * np.eye(d, dtype=np.float32))
        g = rx.Gamma(shape=2.0, rate=0.02)
        for i in rx.plate(n):
            y[i] = rx.SoftDot(theta, x, g)
        return {"x": x, "g": g}

    res = rx.infer(returnvars=rx.KeepLast(), 
        model=m, data={"y": y}, iterations=20,
        initialization={
            "x": MvNormalMeanCovariance(np.zeros(d, np.float32),
                                        np.eye(d, dtype=np.float32)),
            "g": GammaShapeRate(2.0, 0.02),
        },
    )
    x_est = np.asarray(res.posteriors["x"].mean())
    assert abs(theta @ x_est - s_true) < 0.05


def test_mixture_prior_selection():
    """theta = Mixture(z, (a, b)) — mixture-of-priors model selection: the
    switch posterior must pick the component consistent with the data."""
    rng = np.random.default_rng(3)
    n = 150
    y = (2.0 + 0.5 * rng.standard_normal(n)).astype(np.float32)

    @rx.model
    def m(y):
        z = rx.Categorical(np.array([0.5, 0.5], np.float32))
        a = rx.Normal(mean=-2.0, var=0.5)
        b = rx.Normal(mean=2.0, var=0.5)
        theta = rx.Mixture(z, (a, b))
        for i in rx.plate(n):
            y[i] = rx.Normal(mean=theta, var=0.25)
        return {"z": z, "a": a, "b": b, "theta": theta}

    res = rx.infer(returnvars=rx.KeepLast(), 
        model=m, data={"y": y}, iterations=15,
        initialization={"a": NormalMeanVariance(-2.0, 0.5),
                        "b": NormalMeanVariance(2.0, 0.5),
                        "theta": NormalMeanVariance(0.0, 5.0)},
    )
    z = np.asarray(res.posteriors["z"].mean())
    assert z[1] > 0.9
    assert abs(float(res.posteriors["theta"].mean()) - y.mean()) < 0.2


def test_uninformative_prior():
    """Uninformative node: flat prior — posterior driven by the data alone."""
    rng = np.random.default_rng(4)
    n = 100
    y = (3.0 + 0.5 * rng.standard_normal(n)).astype(np.float32)

    @rx.model
    def m(y):
        mu = rx.Uninformative()
        for i in rx.plate(n):
            y[i] = rx.Normal(mean=mu, var=0.25)
        return {"mu": mu}

    res = rx.infer(returnvars=rx.KeepLast(), model=m, data={"y": y}, iterations=1)
    assert abs(float(res.posteriors["mu"].mean()) - y.mean()) < 1e-3
    assert abs(float(res.posteriors["mu"].var()) - 0.25 / n) < 1e-4


def test_catch_exception_partial_result():
    @rx.model
    def bad(y):
        a = rx.Normal(mean=0.0, var=1.0)
        b = rx.Gamma(shape=1.0, rate=1.0)
        for i in rx.plate(len(y)):
            y[i] = rx.Normal(mean=a, precision=b)
        return {"a": a, "b": b}

    y = np.zeros(5, np.float32)
    # initialization for an unknown variable → validation error, caught
    res = rx.infer(returnvars=rx.KeepLast(), model=bad, data={"y": y}, iterations=2, catch_exception=True,
                   initialization={"nonexistent": GammaShapeRate(1.0, 1.0)})
    assert res.error is not None
    assert "unknown" in str(res.error).lower()
    assert res.posteriors == {}


def test_meta_per_neighborhood_matching():
    """Tuple meta keys match node instances by neighbor variable names
    (reference @meta per-neighborhood form ``GCV(x, k, w) -> ...``,
    docs/src/manuals/inference/meta-specification.md:9-98)."""
    import jax.numpy as jnp

    import rxinfer_tpu as rx
    from rxinfer_tpu.engine.compile import CompiledModel

    @rx.model
    def m(y):
        a = rx.Normal(mean=0.0, var=1.0)
        b = rx.Normal(mean=0.0, var=1.0)
        u = rx.Delta(jnp.sin, a)
        v = rx.Delta(jnp.sin, b)
        y.observe(rx.Normal(mean=u + v, var=1.0))
        return {"a": a, "b": b}

    graph = m.trace({"y": 0.5})
    CompiledModel(
        graph,
        init={"a": rx.dists.NormalMeanVariance(0.0, 1.0),
              "b": rx.dists.NormalMeanVariance(0.0, 1.0)},
        meta={("Delta", ("a",)): {"tag": "only-a"}},
    )
    tags = {}
    for f in graph.factors:
        if f.meta and "tag" in (f.meta or {}):
            names = [v.var.name for v in f.all_interfaces().values()
                     if hasattr(v, "var")]
            tags[tuple(sorted(n for n in names if not n.startswith("_")))] = \
                f.meta["tag"]
    assert any("a" in k for k in tags), tags
    assert not any("b" in k for k in tags), tags
