"""Natural-gradient exponential-family manifold projection
(engine/projection.py; reference ExponentialFamilyProjection via
ProjectionExt, ext/ProjectionExt/ProjectionExt.jl:24-67 and
test/ext/ProjectionExt/inference_with_projection_tests.jl)."""

import numpy as np
import pytest

import rxinfer_tpu as rx
from rxinfer_tpu.dists import (
    Beta,
    Dirichlet,
    GammaShapeRate,
    MvNormalMeanCovariance,
    NormalMeanVariance,
)
from rxinfer_tpu.engine.projection import (
    fit_weighted_samples,
    project_logpdf,
)


def test_project_gaussian_target_recovers_exactly():
    """Projecting a Gaussian logpdf onto the Gaussian family must recover it
    (the M-projection of a member is itself)."""
    target = NormalMeanVariance(2.5, 0.49)
    q = project_logpdf("gaussian", target.logpdf,
                       NormalMeanVariance(0.0, 10.0), n_iters=60,
                       n_samples=1024, seed=1)
    assert abs(float(q.mean()) - 2.5) < 0.05
    assert abs(float(q.var()) - 0.49) < 0.08


def test_project_multivariate_gaussian():
    m = np.array([1.0, -2.0, 0.5], np.float32)
    c = np.array([[1.0, 0.3, 0.0], [0.3, 0.5, 0.1], [0.0, 0.1, 0.8]],
                 np.float32)
    target = MvNormalMeanCovariance(m, c)
    init = MvNormalMeanCovariance(np.zeros(3, np.float32),
                                  5.0 * np.eye(3, dtype=np.float32))
    q = project_logpdf("mv_gaussian", target.logpdf, init, n_iters=80,
                       n_samples=2048, seed=2)
    np.testing.assert_allclose(np.asarray(q.mean()), m, atol=0.1)
    np.testing.assert_allclose(np.asarray(q.cov()), c, atol=0.15)


def test_project_gamma_family():
    target = GammaShapeRate(5.0, 2.0)
    q = project_logpdf("gamma", target.logpdf, GammaShapeRate(1.0, 0.5),
                       n_iters=80, n_samples=2048, seed=3)
    assert abs(float(q.mean()) - 2.5) < 0.15
    assert abs(float(q.var()) - 1.25) < 0.3


def test_project_dirichlet_family():
    alpha = np.array([3.0, 7.0, 2.0], np.float32)
    target = Dirichlet(alpha)
    q = project_logpdf("dirichlet", target.logpdf,
                       Dirichlet(np.ones(3, np.float32)), n_iters=80,
                       n_samples=2048, seed=4)
    np.testing.assert_allclose(np.asarray(q.mean()),
                               alpha / alpha.sum(), atol=0.03)


def test_fit_weighted_samples_beta_gamma_dirichlet():
    """The weighted-cloud M-projection (digamma Newton inversions) recovers
    the generating parameters from large samples."""
    import jax

    key = jax.random.PRNGKey(0)
    b = Beta(4.0, 2.0).sample(key, (20000,))
    fit = fit_weighted_samples("beta", b, np.ones(20000, np.float32))
    assert abs(float(fit.a) - 4.0) < 0.3 and abs(float(fit.b) - 2.0) < 0.2

    g = GammaShapeRate(3.0, 1.5).sample(key, (20000,))
    fit = fit_weighted_samples("gamma", g, np.ones(20000, np.float32))
    a, rate = fit.shape_rate()
    assert abs(float(a) - 3.0) < 0.2 and abs(float(rate) - 1.5) < 0.12

    dsamp = Dirichlet(np.array([2.0, 5.0, 1.0], np.float32)).sample(
        key, (20000,))
    fit = fit_weighted_samples("dirichlet", dsamp,
                               np.ones(20000, np.float32))
    np.testing.assert_allclose(np.asarray(fit.alpha), [2.0, 5.0, 1.0],
                               rtol=0.12)


def test_projection_exact_convert_same_family():
    """Reference ProjectionExt:28-35: same-family input converts exactly —
    no sampling noise."""
    pt = rx.ProjectedTo("gaussian")
    d = NormalMeanVariance(1.0, 2.0)
    out = pt.constrain(d)
    assert float(out.mean()) == 1.0 and float(out.var()) == 2.0
    # a product of same-family messages is the exact natural-param sum
    out2 = pt.project_product([NormalMeanVariance(0.0, 1.0),
                               NormalMeanVariance(1.0, 1.0)])
    assert abs(float(out2.mean()) - 0.5) < 1e-6
    assert abs(float(out2.var()) - 0.5) < 1e-6


def test_projection_warm_start_uses_prev():
    """prev= of the target family seeds the descent: with zero iterations of
    drift tolerance, a warm start at the answer stays at the answer."""
    target = NormalMeanVariance(3.0, 0.25)
    pt = rx.ProjectedTo("gaussian", n_iters=20, n_samples=512)
    q = pt.project_product(
        [rx.dists.GammaShapeRate(2.0, 1.0),  # non-gaussian: forces projection
         target],
        prev=NormalMeanVariance(2.8, 0.3),
    )
    # posterior of gamma×gaussian product is near the (clipped) overlap
    assert 1.5 < float(q.mean()) < 3.5


def test_nonconjugate_inference_gamma_target():
    """theta ~ Gamma; y_i ~ N(theta, 0.2) — projected onto the gamma manifold
    through infer(); checked against quadrature."""
    from scipy import integrate
    from scipy.stats import gamma as sp_gamma, norm as sp_norm

    rng = np.random.default_rng(0)
    theta_true = 2.0
    n = 50
    y = (theta_true
         + np.sqrt(0.2) * rng.standard_normal(n)).astype(np.float32)

    @rx.model
    def m(y):
        theta = rx.Gamma(shape=2.0, rate=1.0)
        for i in rx.plate(n):
            y[i] = rx.Normal(mean=theta, var=0.2)
        return {"theta": theta}

    cs = rx.constraints(forms={"theta": rx.ProjectedTo("gamma",
                                                       n_samples=2048)})
    res = rx.infer(returnvars=rx.KeepLast(), model=m, data={"y": y}, iterations=6, constraints=cs,
                   initialization={"theta": GammaShapeRate(2.0, 1.0)})
    q = res.posteriors["theta"]

    ts = np.linspace(1e-3, 6.0, 4001)
    w = sp_gamma(2.0, scale=1.0).pdf(ts) * np.exp(
        np.sum(sp_norm(ts, np.sqrt(0.2)).logpdf(y[:, None]), axis=0))
    w /= integrate.trapezoid(w, ts)
    mean_exact = integrate.trapezoid(ts * w, ts)
    var_exact = integrate.trapezoid((ts - mean_exact) ** 2 * w, ts)
    assert abs(float(q.mean()) - mean_exact) < 0.05
    assert abs(float(q.var()) - var_exact) < 0.6 * var_exact + 1e-4


def test_cvi_projection_out_family():
    """CVIProjection(out_family=...): the delta out message projected onto a
    non-Gaussian family by the shared M-projection machinery."""
    import jax.numpy as jnp

    from rxinfer_tpu.rules.delta import CVIProjection
    from rxinfer_tpu.rules.registry import get_node

    q = {
        "in0": NormalMeanVariance(0.5, 0.04),
        "_meta": {
            "fn": lambda x: jnp.exp(x),
            "method": CVIProjection(n_samples=4096, out_family="gamma"),
            "_plated": False,
        },
    }
    msg = get_node("Delta").message_to_out(q)
    assert isinstance(msg, GammaShapeRate)
    # lognormal(0.5, 0.04): mean = exp(0.52) ≈ 1.682, var ≈ mean^2*(e^.04-1)
    assert abs(float(msg.mean()) - np.exp(0.52)) < 0.08
    assert abs(float(msg.var()) - np.exp(1.04) * (np.exp(0.04) - 1)) < 0.05
