import jax.numpy as jnp
import numpy as np
import pytest

from rxinfer_tpu.dists import (
    MvNormalMeanCovariance,
    MvNormalMeanPrecision,
    MvNormalWeightedMeanPrecision,
    NormalMeanPrecision,
    NormalMeanVariance,
    NormalWeightedMeanPrecision,
    PointMass,
    prod,
    vague,
)


def test_scalar_parametrizations_agree():
    mu, v = 1.5, 0.25
    ds = [
        NormalMeanVariance(jnp.float32(mu), jnp.float32(v)),
        NormalMeanPrecision(jnp.float32(mu), jnp.float32(1 / v)),
        NormalWeightedMeanPrecision(jnp.float32(mu / v), jnp.float32(1 / v)),
    ]
    for d in ds:
        assert np.isclose(d.mean(), mu, atol=1e-6)
        assert np.isclose(d.var(), v, atol=1e-6)
        assert np.isclose(d.precision(), 1 / v, atol=1e-5)
        assert np.isclose(d.weightedmean(), mu / v, atol=1e-5)


def test_scalar_entropy_logpdf():
    d = NormalMeanVariance(jnp.float32(0.3), jnp.float32(2.0))
    # analytic N(0.3, 2.0)
    assert np.isclose(d.entropy(), 0.5 * np.log(2 * np.pi * np.e * 2.0), atol=1e-5)
    x = 1.1
    expected = -0.5 * (np.log(2 * np.pi * 2.0) + (x - 0.3) ** 2 / 2.0)
    assert np.isclose(d.logpdf(jnp.float32(x)), expected, atol=1e-5)


def test_scalar_product_is_precision_addition():
    a = NormalMeanVariance(jnp.float32(1.0), jnp.float32(2.0))
    b = NormalMeanPrecision(jnp.float32(-1.0), jnp.float32(4.0))
    p = prod(a, b)
    assert isinstance(p, NormalWeightedMeanPrecision)
    assert np.isclose(p.w, 0.5 + 4.0, atol=1e-6)
    assert np.isclose(p.xi, 1.0 / 2.0 + (-1.0) * 4.0, atol=1e-6)


def _rand_spd(rng, d):
    a = rng.standard_normal((d, d)).astype(np.float32)
    return a @ a.T + d * np.eye(d, dtype=np.float32)


@pytest.mark.parametrize("d", [2, 3, 5])
def test_mv_parametrizations_agree(d):
    rng = np.random.default_rng(0)
    mu = rng.standard_normal(d).astype(np.float32)
    sigma = _rand_spd(rng, d)
    w = np.linalg.inv(sigma).astype(np.float32)
    xi = (w @ mu).astype(np.float32)
    ds = [
        MvNormalMeanCovariance(jnp.asarray(mu), jnp.asarray(sigma)),
        MvNormalMeanPrecision(jnp.asarray(mu), jnp.asarray(w)),
        MvNormalWeightedMeanPrecision(jnp.asarray(xi), jnp.asarray(w)),
    ]
    for dist in ds:
        np.testing.assert_allclose(dist.mean(), mu, atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(dist.cov(), sigma, atol=2e-3, rtol=1e-3)


def test_mv_entropy_and_logpdf_match_analytic():
    rng = np.random.default_rng(1)
    d = 3
    mu = rng.standard_normal(d).astype(np.float32)
    sigma = _rand_spd(rng, d)
    dist = MvNormalMeanCovariance(jnp.asarray(mu), jnp.asarray(sigma))
    sign, logdet = np.linalg.slogdet(sigma)
    assert sign > 0
    h_expected = 0.5 * d * (1 + np.log(2 * np.pi)) + 0.5 * logdet
    assert np.isclose(dist.entropy(), h_expected, rtol=1e-5)
    x = rng.standard_normal(d).astype(np.float32)
    diff = x - mu
    lp_expected = -0.5 * (d * np.log(2 * np.pi) + logdet + diff @ np.linalg.inv(sigma) @ diff)
    assert np.isclose(dist.logpdf(jnp.asarray(x)), lp_expected, rtol=1e-4, atol=1e-4)


def test_mv_product():
    rng = np.random.default_rng(2)
    d = 2
    s1, s2 = _rand_spd(rng, d), _rand_spd(rng, d)
    m1 = rng.standard_normal(d).astype(np.float32)
    m2 = rng.standard_normal(d).astype(np.float32)
    p = prod(
        MvNormalMeanCovariance(jnp.asarray(m1), jnp.asarray(s1)),
        MvNormalMeanCovariance(jnp.asarray(m2), jnp.asarray(s2)),
    )
    w_expected = np.linalg.inv(s1) + np.linalg.inv(s2)
    mean_expected = np.linalg.solve(
        w_expected, np.linalg.solve(s1, m1) + np.linalg.solve(s2, m2)
    )
    np.testing.assert_allclose(p.precision(), w_expected, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(p.mean(), mean_expected, rtol=1e-3, atol=1e-3)


def test_pointmass_absorbs():
    pm = PointMass(jnp.float32(2.0))
    other = NormalMeanVariance(jnp.float32(0.0), jnp.float32(1.0))
    assert prod(pm, other) is pm
    assert prod(other, pm) is pm


def test_vague_is_flat():
    v = vague(NormalMeanVariance)
    assert v.var() > 1e10
    mv = vague(MvNormalMeanPrecision, 3)
    assert mv.w.shape == (3, 3)


def test_batched_mv_ops():
    rng = np.random.default_rng(3)
    batch, d = 7, 2
    sigmas = np.stack([_rand_spd(rng, d) for _ in range(batch)])
    mus = rng.standard_normal((batch, d)).astype(np.float32)
    dist = MvNormalMeanCovariance(jnp.asarray(mus), jnp.asarray(sigmas))
    assert dist.mean().shape == (batch, d)
    assert dist.precision().shape == (batch, d, d)
    assert dist.entropy().shape == (batch,)
