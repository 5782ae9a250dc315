"""Forward-backward vs brute-force enumeration."""

import itertools

import numpy as np
import jax.numpy as jnp

from rxinfer_tpu.ops.discrete_chain import forward_backward, parallel_forward_backward


def _brute_force(log_prior, log_trans, log_evidence):
    T, K = log_evidence.shape
    states = list(itertools.product(range(K), repeat=T))
    logps = []
    for s in states:
        lp = log_prior[s[0]] + log_evidence[0, s[0]]
        for t in range(1, T):
            lp += log_trans[t - 1, s[t], s[t - 1]] + log_evidence[t, s[t]]
        logps.append(lp)
    logps = np.array(logps)
    logZ = np.logaddexp.reduce(logps)
    p = np.exp(logps - logZ)
    gammas = np.zeros((T, K))
    xis = np.zeros((T - 1, K, K))
    for prob, s in zip(p, states):
        for t in range(T):
            gammas[t, s[t]] += prob
        for t in range(T - 1):
            xis[t, s[t + 1], s[t]] += prob
    return gammas, xis, logZ


def _random_chain(T=6, K=3, seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.standard_normal(K).astype(np.float32),
        rng.standard_normal((T - 1, K, K)).astype(np.float32),
        rng.standard_normal((T, K)).astype(np.float32),
    )


def test_sequential_matches_brute_force():
    lp, lt, le = _random_chain()
    res = forward_backward(jnp.asarray(lp), jnp.asarray(lt), jnp.asarray(le))
    g, x, z = _brute_force(lp, lt, le)
    np.testing.assert_allclose(res.gammas, g, atol=1e-5)
    np.testing.assert_allclose(res.xis, x, atol=1e-5)
    assert np.isclose(res.logZ, z, rtol=1e-5)


def test_parallel_matches_sequential():
    lp, lt, le = _random_chain(T=40, K=4, seed=1)
    seq = forward_backward(jnp.asarray(lp), jnp.asarray(lt), jnp.asarray(le))
    par = parallel_forward_backward(jnp.asarray(lp), jnp.asarray(lt), jnp.asarray(le))
    np.testing.assert_allclose(par.gammas, seq.gammas, atol=1e-5)
    np.testing.assert_allclose(par.xis, seq.xis, atol=1e-5)
    assert np.isclose(par.logZ, seq.logZ, rtol=1e-5)
