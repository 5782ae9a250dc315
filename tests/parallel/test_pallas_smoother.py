"""Fused Pallas batched RTS smoother == parallel_smoother (interpret on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from rxinfer_tpu.ops.kalman import ChainParams, parallel_smoother
from rxinfer_tpu.ops.pallas_smoother import fused_batched_smoother


def _params(b, d, t, seed=0):
    rng = np.random.default_rng(seed)
    th = np.pi / 25
    rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]],
                   np.float32)
    f = np.kron(np.eye(d // 2, dtype=np.float32), rot)
    q = 0.4 * np.eye(d, dtype=np.float32)
    w = 0.8 * np.eye(d, dtype=np.float32)
    bvec = 0.1 * np.arange(d, dtype=np.float32)
    xi = rng.standard_normal((t, b, d)).astype(np.float32)
    m0 = rng.standard_normal((b, d)).astype(np.float32)
    p0 = np.broadcast_to(9.0 * np.eye(d, dtype=np.float32), (b, d, d))
    return m0, p0, xi, f, bvec, q, w


def _oracle(m0, p0, xi, f, bvec, q, w):
    b_n, d = m0.shape
    t = xi.shape[0]

    def one(m0i, p0i, xii):
        p = ChainParams(
            jnp.asarray(m0i), jnp.asarray(p0i),
            jnp.broadcast_to(jnp.asarray(f), (t - 1, d, d)),
            jnp.broadcast_to(jnp.asarray(bvec), (t - 1, d)),
            jnp.broadcast_to(jnp.asarray(q), (t - 1, d, d)),
            jnp.asarray(xii),
            jnp.broadcast_to(jnp.asarray(w), (t, d, d)),
        )
        r = parallel_smoother(p)
        return r.means, r.covs, r.cross

    return jax.vmap(one, in_axes=(0, 0, 1), out_axes=(1, 1, 1))(
        m0, p0, xi
    )


def test_fused_smoother_matches_parallel():
    m0, p0, xi, f, bvec, q, w = _params(b=5, d=4, t=23)  # odd B/T paddings
    ref_m, ref_p, ref_c = _oracle(m0, p0, xi, f, bvec, q, w)
    ms, ps, cross = fused_batched_smoother(
        jnp.asarray(m0), jnp.asarray(p0), jnp.asarray(xi),
        f, bvec, q, w, chunk=4, interpret=True,
    )
    np.testing.assert_allclose(ms, ref_m, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(ps, ref_p, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(cross, ref_c, rtol=3e-4, atol=3e-4)


def test_fused_smoother_d2():
    m0, p0, xi, f, bvec, q, w = _params(b=3, d=2, t=16, seed=2)
    ref_m, ref_p, ref_c = _oracle(m0, p0, xi, f, bvec, q, w)
    ms, ps, cross = fused_batched_smoother(
        jnp.asarray(m0), jnp.asarray(p0), jnp.asarray(xi),
        f, bvec, q, w, chunk=8, interpret=True,
    )
    np.testing.assert_allclose(ms, ref_m, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(cross, ref_c, rtol=3e-4, atol=3e-4)


def test_fused_smoother_bf16_moments():
    """bf16 moment streaming: means near-fp32, covs within bf16 tolerance."""
    m0, p0, xi, f, bvec, q, w = _params(b=4, d=4, t=24, seed=5)
    ms32, ps32, c32 = fused_batched_smoother(
        jnp.asarray(m0), jnp.asarray(p0), jnp.asarray(xi),
        f, bvec, q, w, chunk=8, interpret=True,
    )
    ms16, ps16, c16 = fused_batched_smoother(
        jnp.asarray(m0), jnp.asarray(p0), jnp.asarray(xi),
        f, bvec, q, w, chunk=8, interpret=True, moment_dtype=jnp.bfloat16,
    )
    assert ps16.dtype == jnp.float32  # wrapper returns fp32
    np.testing.assert_allclose(ms16, ms32, rtol=0, atol=3e-2)
    np.testing.assert_allclose(ps16, ps32, rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(c16, c32, rtol=0, atol=5e-2)
