import jax.numpy as jnp
import numpy as np
from scipy import stats as sps

from rxinfer_tpu.dists import (
    Bernoulli,
    Beta,
    Categorical,
    Dirichlet,
    DirichletCollection,
    GammaShapeRate,
    GammaShapeScale,
    InverseGamma,
    InverseWishart,
    Poisson,
    Wishart,
    prod,
)


def test_beta_stats_and_product():
    d = Beta(jnp.float32(3.0), jnp.float32(5.0))
    ref = sps.beta(3.0, 5.0)
    assert np.isclose(d.mean(), ref.mean(), rtol=1e-5)
    assert np.isclose(d.var(), ref.var(), rtol=1e-5)
    assert np.isclose(d.entropy(), ref.entropy(), rtol=1e-4)
    assert np.isclose(d.logpdf(jnp.float32(0.3)), ref.logpdf(0.3), rtol=1e-4)
    p = prod(Beta(jnp.float32(2.0), jnp.float32(3.0)), Beta(jnp.float32(4.0), jnp.float32(1.0)))
    assert np.isclose(p.a, 5.0) and np.isclose(p.b, 3.0)


def test_bernoulli():
    d = Bernoulli(jnp.float32(0.3))
    ref = sps.bernoulli(0.3)
    assert np.isclose(d.mean(), 0.3)
    assert np.isclose(d.entropy(), ref.entropy(), rtol=1e-5)
    p = prod(Bernoulli(jnp.float32(0.3)), Bernoulli(jnp.float32(0.6)))
    expected = 0.3 * 0.6 / (0.3 * 0.6 + 0.7 * 0.4)
    assert np.isclose(p.p, expected, rtol=1e-5)


def test_gamma_parametrizations():
    a, rate = 2.5, 4.0
    d1 = GammaShapeRate(jnp.float32(a), jnp.float32(rate))
    d2 = GammaShapeScale(jnp.float32(a), jnp.float32(1 / rate))
    ref = sps.gamma(a, scale=1 / rate)
    for d in (d1, d2):
        assert np.isclose(d.mean(), ref.mean(), rtol=1e-5)
        assert np.isclose(d.var(), ref.var(), rtol=1e-5)
        assert np.isclose(d.entropy(), ref.entropy(), rtol=1e-4)
        assert np.isclose(d.logpdf(jnp.float32(1.7)), ref.logpdf(1.7), rtol=1e-4)
    # E[log x] = digamma(a) - log(rate)
    from scipy.special import digamma

    assert np.isclose(d1.mean_log(), digamma(a) - np.log(rate), rtol=1e-5)
    p = prod(d1, d2)
    assert np.isclose(p.a, 2 * a - 1.0) and np.isclose(p.b, 2 * rate)


def test_inverse_gamma():
    d = InverseGamma(jnp.float32(3.0), jnp.float32(2.0))
    ref = sps.invgamma(3.0, scale=2.0)
    assert np.isclose(d.mean(), ref.mean(), rtol=1e-5)
    assert np.isclose(d.var(), ref.var(), rtol=1e-4)
    assert np.isclose(d.logpdf(jnp.float32(0.9)), ref.logpdf(0.9), rtol=1e-4)


def test_poisson():
    d = Poisson(jnp.float32(3.5))
    ref = sps.poisson(3.5)
    assert np.isclose(d.logpdf(jnp.float32(2.0)), ref.logpmf(2), rtol=1e-5)
    assert np.isclose(d.entropy(), ref.entropy(), rtol=1e-2)


def test_categorical_logit_products():
    logits = jnp.asarray([0.1, 1.0, -0.5])
    d = Categorical(logits)
    p = np.exp(logits) / np.exp(logits).sum()
    np.testing.assert_allclose(d.mean(), p, rtol=1e-5)
    ref = sps.entropy(p)
    assert np.isclose(d.entropy(), ref, rtol=1e-5)
    d2 = prod(d, Categorical(jnp.asarray([0.0, 0.0, 2.0])))
    p2 = p * np.exp([0, 0, 2.0])
    p2 /= p2.sum()
    np.testing.assert_allclose(d2.mean(), p2, rtol=1e-5)


def test_dirichlet():
    alpha = np.array([2.0, 3.0, 4.0], dtype=np.float32)
    d = Dirichlet(jnp.asarray(alpha))
    ref = sps.dirichlet(alpha)
    np.testing.assert_allclose(d.mean(), ref.mean(), rtol=1e-5)
    assert np.isclose(d.entropy(), ref.entropy(), rtol=1e-4)
    from scipy.special import digamma

    np.testing.assert_allclose(
        d.mean_log(), digamma(alpha) - digamma(alpha.sum()), rtol=1e-4
    )
    p = prod(d, Dirichlet(jnp.asarray([1.0, 1.0, 2.0])))
    np.testing.assert_allclose(p.alpha, [2.0, 3.0, 5.0], rtol=1e-6)


def test_dirichlet_collection_columns():
    alpha = np.abs(np.random.default_rng(0).standard_normal((3, 4))).astype(np.float32) + 1.0
    d = DirichletCollection(jnp.asarray(alpha))
    m = np.asarray(d.mean())
    np.testing.assert_allclose(m.sum(axis=0), np.ones(4), rtol=1e-5)
    # entropy = sum of per-column Dirichlet entropies
    h_expected = sum(sps.dirichlet(alpha[:, j]).entropy() for j in range(4))
    assert np.isclose(d.entropy(), h_expected, rtol=1e-4)


def test_wishart():
    nu, d = 5.0, 2
    s = np.array([[2.0, 0.3], [0.3, 1.0]], dtype=np.float32)
    w = Wishart(jnp.float32(nu), jnp.asarray(s))
    ref = sps.wishart(df=nu, scale=s)
    np.testing.assert_allclose(w.mean(), ref.mean(), rtol=1e-5)
    x = np.array([[3.0, 0.5], [0.5, 2.0]], dtype=np.float32)
    assert np.isclose(w.logpdf(jnp.asarray(x)), ref.logpdf(x), rtol=1e-4)
    assert np.isclose(w.entropy(), ref.entropy(), rtol=1e-4)


def test_inverse_wishart():
    nu, d = 6.0, 2
    psi = np.array([[2.0, 0.3], [0.3, 1.0]], dtype=np.float32)
    w = InverseWishart(jnp.float32(nu), jnp.asarray(psi))
    ref = sps.invwishart(df=nu, scale=psi)
    np.testing.assert_allclose(w.mean(), ref.mean(), rtol=1e-4)
    x = np.array([[0.5, 0.05], [0.05, 0.3]], dtype=np.float32)
    assert np.isclose(w.logpdf(jnp.asarray(x)), ref.logpdf(x), rtol=1e-4)
    # E[X^{-1}] = nu * psi^{-1}
    np.testing.assert_allclose(w.mean_inverse(), nu * np.linalg.inv(psi), rtol=1e-4)
