"""Closed-form small-matrix tier (ops/smallmat.py) — accuracy of the
branch-free Schur-recursion inverses/determinants vs float64 numpy, up to the
round-4 d=16 extension (8|rest splits; no pivoting, valid for the SPD /
diagonally-dominant matrices of the message algebra)."""

import numpy as np
import jax.numpy as jnp

from rxinfer_tpu.ops.smallmat import (
    small_inv,
    small_logdet,
    small_solve,
)


def _spd(rng, b, d, scale=1.0):
    a = rng.standard_normal((b, d, d))
    m = np.einsum("bij,bkj->bik", a, a) + d * np.eye(d)
    return (scale * m).astype(np.float32)


def test_small_inv_d_up_to_16_spd():
    rng = np.random.default_rng(0)
    for d in (5, 8, 12, 16):
        m = _spd(rng, 32, d)
        inv = np.asarray(small_inv(jnp.asarray(m)))
        oracle = np.linalg.inv(m.astype(np.float64))
        err = np.abs(inv - oracle).max() / np.abs(oracle).max()
        assert err < 5e-5, (d, err)
        # residual check: ||M @ inv − I||
        resid = np.abs(np.einsum("bij,bjk->bik", m.astype(np.float64), inv)
                       - np.eye(d)).max()
        assert resid < 5e-4, (d, resid)


def test_small_inv_vague_scaling_d16():
    """The diagonal normalization keeps vague (1e12·I-scale) matrices inside
    fp32 determinant range at d=16 too."""
    rng = np.random.default_rng(1)
    m = _spd(rng, 8, 16, scale=1e10)
    inv = np.asarray(small_inv(jnp.asarray(m)))
    assert np.isfinite(inv).all()
    resid = np.abs(
        np.einsum("bij,bjk->bik", m.astype(np.float64), inv) - np.eye(16)
    ).max()
    assert resid < 1e-3, resid


def test_small_logdet_d_up_to_16():
    rng = np.random.default_rng(2)
    for d in (6, 12, 16):
        m = _spd(rng, 16, d)
        ld = np.asarray(small_logdet(jnp.asarray(m)))
        oracle = np.linalg.slogdet(m.astype(np.float64))[1]
        np.testing.assert_allclose(ld, oracle, rtol=5e-5, atol=1e-4)


def test_small_solve_d16_matrix_and_vector():
    rng = np.random.default_rng(3)
    d = 16
    m = _spd(rng, 8, d)
    x_mat = rng.standard_normal((8, d, 3)).astype(np.float32)
    x_vec = rng.standard_normal((8, d)).astype(np.float32)
    s_mat = np.asarray(small_solve(jnp.asarray(m), jnp.asarray(x_mat),
                                   matrix=True))
    s_vec = np.asarray(small_solve(jnp.asarray(m), jnp.asarray(x_vec),
                                   matrix=False))
    o_mat = np.linalg.solve(m.astype(np.float64), x_mat.astype(np.float64))
    o_vec = np.linalg.solve(m.astype(np.float64),
                            x_vec.astype(np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(s_mat, o_mat, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(s_vec, o_vec, rtol=2e-4, atol=2e-4)
