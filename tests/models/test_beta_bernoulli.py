"""Beta-Bernoulli conformance (reference: test/models/ Beta-Bernoulli tier-2 test;
exact posterior Beta(a + Σy, b + n - Σy) and FE = -log evidence)."""

import numpy as np
import jax.numpy as jnp
from scipy.special import betaln

import rxinfer_tpu as rx


def make_model():
    @rx.model
    def beta_bernoulli(y):
        theta = rx.Beta(4.0, 8.0)
        for i in rx.plate(len(y)):
            y[i] = rx.Bernoulli(theta)
        return theta

    return beta_bernoulli


def test_exact_posterior():
    rng = np.random.default_rng(42)
    n = 200
    y = (rng.uniform(size=n) < 0.7).astype(np.float32)
    res = rx.infer(returnvars=rx.KeepLast(), model=make_model(), data={"y": y}, iterations=1)
    q = res.posteriors["_v1"] if "_v1" in res.posteriors else None
    # theta is anonymous-free: it's returned under its auto name; find the Beta
    assert len(res.posteriors) == 1
    q = next(iter(res.posteriors.values()))
    a_exp = 4.0 + y.sum()
    b_exp = 8.0 + n - y.sum()
    assert np.isclose(q.a, a_exp, atol=1e-3)
    assert np.isclose(q.b, b_exp, atol=1e-3)


def test_free_energy_equals_neg_log_evidence():
    rng = np.random.default_rng(0)
    n = 50
    y = (rng.uniform(size=n) < 0.3).astype(np.float32)
    res = rx.infer(returnvars=rx.KeepLast(), model=make_model(), data={"y": y}, iterations=3, free_energy=True)
    s = y.sum()
    # log evidence of Beta-Bernoulli: B(a+s, b+n-s) / B(a,b)
    log_z = betaln(4.0 + s, 8.0 + n - s) - betaln(4.0, 8.0)
    fe = np.asarray(res.free_energy)
    assert fe.shape == (3,)
    np.testing.assert_allclose(fe, -log_z, rtol=1e-4)
    # FE is constant across iterations for an exact conjugate model
    assert np.allclose(fe, fe[0], atol=1e-3)
