"""Optimizer-backed PointMass + product-form SampleList constraints
(reference src/constraints/form/form_point_mass.jl:53-205 and
form_sample_list.jl:29-104; tests mirror
test/constraints/form/form_point_mass_tests.jl's brute-force cross-check)."""

import jax.numpy as jnp
import numpy as np
import pytest

import rxinfer_tpu as rx
from rxinfer_tpu.dists import (
    Beta,
    GammaShapeRate,
    LogPdfMessage,
    NormalMeanVariance,
    PointMass,
    SampleList,
)


def test_pointmass_closed_form_mode_fast_path():
    pm = rx.PointMassFormConstraint()
    out = pm.constrain(Beta(5.0, 3.0))
    assert isinstance(out, PointMass)
    assert abs(float(out.mean()) - 4.0 / 6.0) < 1e-6  # (a-1)/(a+b-2)


def test_pointmass_lbfgs_matches_brute_force_grid():
    """Non-analytic density: MAP via LBFGS vs a dense grid argmax
    (the reference cross-checks Optim against brute force)."""

    def log_target(x):
        return -0.5 * (x - 1.3) ** 2 / 0.04 + 0.3 * jnp.sin(3.0 * x)

    msg = LogPdfMessage(log_target)
    pm = rx.PointMassFormConstraint(starting_point=np.float32(0.0),
                                    n_iters=50)
    out = pm.project_product([msg])
    xs = np.linspace(-2.0, 4.0, 200001)
    brute = xs[np.argmax(np.asarray(log_target(jnp.asarray(xs))))]
    assert abs(float(out.point) - brute) < 1e-3


def test_pointmass_boundaries_project_into_box():
    """Fminbox equivalent: the optimum of −logpdf outside the box lands on
    the boundary."""
    d = NormalMeanVariance(5.0, 1.0)
    pm = rx.PointMassFormConstraint(boundaries=(0.0, 2.0))
    out = pm.constrain(d)
    assert abs(float(out.point) - 2.0) < 1e-3


def test_pointmass_custom_optimizer_callable():
    seen = {}

    def my_opt(neg_logpdf, x0):
        seen["called"] = True
        xs = jnp.linspace(-3.0, 3.0, 4001)
        return xs[jnp.argmin(jnp.vectorize(neg_logpdf)(xs))]

    d = NormalMeanVariance(1.25, 0.3)
    pm = rx.PointMassFormConstraint(optimizer=my_opt)
    out = pm.constrain(d)
    assert seen.get("called")
    assert abs(float(out.point) - 1.25) < 2e-3


def test_pointmass_nonconjugate_map_through_infer():
    """MAP of a Beta-prior × fallback-likelihood product through infer():
    checked against quadrature argmax (reference form_point_mass semantics)."""
    rng = np.random.default_rng(0)
    y = (rng.uniform(size=100) < 0.7).astype(np.float32)

    @rx.model
    def coin(y):
        p = rx.Beta(3.0, 3.0)
        for i in rx.plate(len(y)):
            y[i] = rx.Bernoulli(p)
        return {"p": p}

    cs = rx.constraints(forms={"p": rx.PointMassFormConstraint(
        starting_point=np.float32(0.5), boundaries=(1e-3, 1 - 1e-3))})
    res = rx.infer(returnvars=rx.KeepLast(), model=coin, data={"y": y}, iterations=4, constraints=cs)
    q = res.posteriors["p"]
    assert isinstance(q, PointMass)
    k = float(y.sum())
    map_exact = (3.0 - 1.0 + k) / (3.0 + 3.0 - 2.0 + len(y))
    assert abs(float(q.point) - map_exact) < 2e-3


def test_samplelist_closed_form_passthrough():
    """Reference form_sample_list.jl:98: proper distributions (and products
    with closed form) pass through UNCHANGED — no sampling noise."""
    sl = rx.SampleListFormConstraint(n_samples=64)
    d = Beta(4.0, 2.0)
    assert sl.constrain(d) is d
    out = sl.project_product([NormalMeanVariance(0.0, 1.0),
                              NormalMeanVariance(2.0, 1.0)])
    assert not isinstance(out, SampleList)
    assert abs(float(out.mean()) - 1.0) < 1e-6


def test_samplelist_importance_samples_the_product():
    """Gaussian proposal × logpdf factor: the weighted sample moments match
    the analytic product of two Gaussians."""
    g1 = NormalMeanVariance(0.0, 1.0)
    g2 = NormalMeanVariance(2.0, 1.0)
    fallback = LogPdfMessage(lambda x: g2.logpdf(x))
    sl = rx.SampleListFormConstraint(n_samples=40000, seed=1)
    out = sl.project_product([g1, fallback])
    assert isinstance(out, SampleList)
    assert abs(float(out.mean()) - 1.0) < 0.03
    assert abs(float(out.var()) - 0.5) < 0.05


def test_samplelist_left_right_proposal_selection():
    g = NormalMeanVariance(1.0, 2.0)
    fb = LogPdfMessage(lambda x: -0.5 * (x - 1.0) ** 2)
    left = rx.SampleListFormConstraint(
        n_samples=1000, strategy=rx.LeftProposal())
    right = rx.SampleListFormConstraint(
        n_samples=1000, strategy=rx.RightProposal())
    assert isinstance(left.project_product([g, fb]), SampleList)
    assert isinstance(right.project_product([fb, g]), SampleList)
    with pytest.raises(ValueError, match="LeftProposal or"):
        rx.SampleListFormConstraint(n_samples=10).project_product([fb, fb])


def test_samplelist_nonconjugate_inference():
    """theta ~ Gamma prior with fallback likelihood — SampleList marginal
    through infer(), moments vs quadrature."""
    from scipy import integrate
    from scipy.stats import gamma as sp_gamma

    rng = np.random.default_rng(1)
    y = (2.0 + 0.5 * rng.standard_normal(40)).astype(np.float32)

    @rx.model
    def m(y):
        theta = rx.Gamma(shape=2.0, rate=1.0)
        for i in rx.plate(len(y)):
            y[i] = rx.Normal(mean=theta, var=0.25)
        return {"theta": theta}

    cs = rx.constraints(forms={"theta": rx.SampleListFormConstraint(
        n_samples=20000, seed=2)})
    res = rx.infer(returnvars=rx.KeepLast(), model=m, data={"y": y}, iterations=4, constraints=cs,
                   initialization={"theta": GammaShapeRate(2.0, 1.0)})
    q = res.posteriors["theta"]

    ts = np.linspace(1e-3, 5.0, 4001)
    w = sp_gamma(2.0, scale=1.0).pdf(ts) * np.exp(
        -0.5 * np.sum((y[:, None] - ts) ** 2, axis=0) / 0.25)
    w /= integrate.trapezoid(w, ts)
    mean_exact = integrate.trapezoid(ts * w, ts)
    assert abs(float(q.mean()) - mean_exact) < 0.05
