"""Fused Pallas discrete forward-backward == scan forward_backward."""

import jax
import jax.numpy as jnp
import numpy as np

from rxinfer_tpu.ops.discrete_chain import forward_backward
from rxinfer_tpu.ops.pallas_discrete import fused_fb_batched


def _setup(b, k, t, seed=0):
    rng = np.random.default_rng(seed)
    lp = np.log(rng.dirichlet(np.ones(k), size=b)).astype(np.float32)
    lt = np.log(
        rng.dirichlet(np.ones(k), size=(b, k)).transpose(0, 2, 1)
    ).astype(np.float32)                      # (B, K, K) columns normalized
    le = (0.5 * rng.standard_normal((t, b, k))).astype(np.float32)
    return jnp.asarray(lp), jnp.asarray(lt), jnp.asarray(le)


def test_fused_fb_matches_scan():
    b, k, t = 5, 3, 37                        # odd B/T exercise padding
    lp, lt, le = _setup(b, k, t)
    g, xi, logz = fused_fb_batched(lp, lt, le, chunk=8, interpret=True)

    def one(lpi, lti, lei):
        r = forward_backward(lpi, jnp.broadcast_to(lti, (t - 1, k, k)), lei)
        return r.gammas, jnp.sum(r.xis, axis=0), r.logZ

    rg, rxi, rlogz = jax.vmap(one, in_axes=(0, 0, 1), out_axes=(1, 0, 0))(
        lp, lt, le
    )
    np.testing.assert_allclose(g, rg, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(xi, rxi, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(logz, rlogz, rtol=2e-4, atol=2e-4)


def test_fused_fb_k5():
    b, k, t = 3, 5, 16
    lp, lt, le = _setup(b, k, t, seed=2)
    g, xi, logz = fused_fb_batched(lp, lt, le, chunk=16, interpret=True)

    def one(lpi, lti, lei):
        r = forward_backward(lpi, jnp.broadcast_to(lti, (t - 1, k, k)), lei)
        return r.gammas, jnp.sum(r.xis, axis=0), r.logZ

    rg, rxi, rlogz = jax.vmap(one, in_axes=(0, 0, 1), out_axes=(1, 0, 0))(
        lp, lt, le
    )
    np.testing.assert_allclose(g, rg, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(xi, rxi, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(logz, rlogz, rtol=2e-4, atol=2e-4)
