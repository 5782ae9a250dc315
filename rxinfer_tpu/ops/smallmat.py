"""Closed-form small-matrix inverses (d ≤ 4) — the per-message linear algebra
of state-space models as pure VPU elementwise code.

General `jnp.linalg.solve`/`cholesky` on (B, d, d) batches of tiny matrices
lowers to LAPACK-style loops that TPUs execute poorly; the streaming filter and
scan composes spend most of their time there.  Cofactor-expansion inverses are
branch-free elementwise arithmetic over the batch — they fuse into the
surrounding adds/matmuls (speed-of-light for the d≤4 LGSSM family).  A
trace-normalization guard keeps determinants in fp32 range for vague (1e12·I)
covariances.
"""

from __future__ import annotations

import jax.numpy as jnp


def _inv2(m):
    a = m[..., 0, 0]
    b = m[..., 0, 1]
    c = m[..., 1, 0]
    d = m[..., 1, 1]
    det = a * d - b * c
    inv_det = 1.0 / det
    row0 = jnp.stack([d, -b], axis=-1)
    row1 = jnp.stack([-c, a], axis=-1)
    return jnp.stack([row0, row1], axis=-2) * inv_det[..., None, None]


def _inv3(m):
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    co_a = e * i - f * h
    co_b = -(d * i - f * g)
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    inv_det = 1.0 / det
    r0 = jnp.stack([co_a, -(b * i - c * h), (b * f - c * e)], axis=-1)
    r1 = jnp.stack([co_b, (a * i - c * g), -(a * f - c * d)], axis=-1)
    r2 = jnp.stack([co_c, -(a * h - b * g), (a * e - b * d)], axis=-1)
    return jnp.stack([r0, r1, r2], axis=-2) * inv_det[..., None, None]


def _inv4(m):
    """Blockwise 4x4 inverse via 2x2 Schur complement."""
    a = m[..., :2, :2]
    b = m[..., :2, 2:]
    c = m[..., 2:, :2]
    d = m[..., 2:, 2:]
    a_inv = _inv2(a)
    ca = c @ a_inv
    schur = d - ca @ b
    s_inv = _inv2(schur)
    ab = a_inv @ b
    top_left = a_inv + ab @ s_inv @ ca
    top_right = -(ab @ s_inv)
    bot_left = -(s_inv @ ca)
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bot = jnp.concatenate([bot_left, s_inv], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _inv_core(ms):
    """Inverse of pre-normalized matrices, d <= 16 (d in 5..8 via 4|rest, d in
    9..16 via 8|rest block Schur complements over the closed-form d<=4
    kernels — branch-free batched arithmetic; no pivoting, which is safe for
    the SPD / diagonally-dominant matrices of the message algebra)."""
    d = ms.shape[-1]
    if d == 1:
        return 1.0 / ms
    if d == 2:
        return _inv2(ms)
    if d == 3:
        return _inv3(ms)
    if d == 4:
        return _inv4(ms)
    k = 8 if d > 8 else 4
    a = ms[..., :k, :k]
    b = ms[..., :k, k:]
    c = ms[..., k:, :k]
    dd = ms[..., k:, k:]
    a_inv = _inv_core(a)
    ca = c @ a_inv
    schur = dd - ca @ b
    s_inv = _inv_core(schur)
    ab = a_inv @ b
    top_left = a_inv + ab @ s_inv @ ca
    top_right = -(ab @ s_inv)
    bot_left = -(s_inv @ ca)
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bot = jnp.concatenate([bot_left, s_inv], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def small_inv(m):
    """General (not necessarily symmetric) inverse for trailing dims d ≤ 8 as
    branch-free elementwise cofactor/Schur arithmetic; falls back to
    jnp.linalg.inv for larger d (where LU's O(d^3) pivoting starts to pay off —
    on TPU, batched LU on tiny matrices lowers to sequential per-matrix loops).

    Inputs are normalized by their mean diagonal magnitude so that determinants
    of vague (1e12-scaled) matrices stay inside fp32 range."""
    d = m.shape[-1]
    if d > 16:
        return jnp.linalg.inv(m)
    scale = jnp.mean(jnp.abs(jnp.diagonal(m, axis1=-2, axis2=-1)), axis=-1)
    scale = jnp.where(scale > 0, scale, 1.0)[..., None, None]
    return _inv_core(m / scale) / scale


def _det2(m):
    return m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]


def _det3(m):
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def _det4(m):
    """det via 2x2 Schur complement: det(M) = det(A) det(D - C A^{-1} B)."""
    a = m[..., :2, :2]
    b = m[..., :2, 2:]
    c = m[..., 2:, :2]
    d = m[..., 2:, 2:]
    schur = d - c @ _inv2(a) @ b
    return _det2(a) * _det2(schur)


def _det_core(ms):
    d = ms.shape[-1]
    if d == 1:
        return ms[..., 0, 0]
    if d == 2:
        return _det2(ms)
    if d == 3:
        return _det3(ms)
    if d == 4:
        return _det4(ms)
    k = 8 if d > 8 else 4
    a = ms[..., :k, :k]
    schur = ms[..., k:, k:] - ms[..., k:, :k] @ _inv_core(a) @ ms[..., :k, k:]
    return _det_core(a) * _det_core(schur)


def small_logdet(m):
    """log|det m| for PD matrices with trailing dims d <= 16, as pure
    elementwise arithmetic (TPU-fast; batched Cholesky lowers to sequential
    per-matrix loops).  Falls back to Cholesky for larger d.  The same
    diagonal normalization as small_inv keeps vague (1e12·I) matrices inside
    fp32 determinant range."""
    d = m.shape[-1]
    if d > 16:
        c = jnp.linalg.cholesky(0.5 * (m + jnp.swapaxes(m, -1, -2)))
        return 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(c, axis1=-2, axis2=-1)), axis=-1
        )
    scale = jnp.mean(jnp.abs(jnp.diagonal(m, axis1=-2, axis2=-1)), axis=-1)
    scale = jnp.where(scale > 0, scale, 1.0)
    det = _det_core(m / scale[..., None, None])
    return jnp.log(jnp.clip(det, 1e-37)) + d * jnp.log(scale)


def small_inv_and_logdet(m):
    """(inverse, log|det|) pair sharing the normalization (d <= 4 fast path)."""
    return small_inv(m), small_logdet(m)


def small_solve(m, x, *, matrix=None):
    """solve(m, x) via closed-form inverse for d ≤ 8.

    ``matrix=True``: x is a matrix RHS (..., d, k); ``matrix=False``: x is
    batched VECTORS (..., d) broadcast against ``m``'s batch.  ``None`` keeps
    the legacy shape heuristic (matrix iff ndim matches and x.shape[-2] == d)
    — ambiguous when a batch of exactly d vectors of dimension d is passed
    (e.g. d samples under one (d, d) cov), so call sites that can hit that
    shape MUST pass the flag explicitly."""
    is_matrix = (
        matrix if matrix is not None
        else x.ndim == m.ndim and x.shape[-2] == m.shape[-1]
    )
    if m.shape[-1] > 16:
        if is_matrix:
            return jnp.linalg.solve(m, x)
        return jnp.linalg.solve(m, x[..., None])[..., 0]
    inv = small_inv(m)
    if is_matrix:
        return inv @ x
    return jnp.einsum("...ij,...j->...i", inv, x)


# ---------------------------------------------------------------------------------
# Struct-of-arrays (batch-minor) variants: matrices stored as (d, d, B).
#
# TPU tiles are (8, 128) over the two minor dims: a (B, 4, 4) batch wastes ~64x
# of every tile, while (d, d, B) puts the batch on the lanes — each cofactor
# term is a full-width VPU op.  This is the speed-of-light layout for the
# streaming filter over many small chains.
# ---------------------------------------------------------------------------------

def _inv2_soa(m):
    a, b = m[0, 0], m[0, 1]
    c, d = m[1, 0], m[1, 1]
    inv_det = 1.0 / (a * d - b * c)
    return jnp.stack([
        jnp.stack([d, -b], axis=0),
        jnp.stack([-c, a], axis=0),
    ], axis=0) * inv_det


def _mm_soa(x, y):
    """(n,k,B) @ (k,m,B) batched over trailing (lane) axis."""
    return jnp.einsum("ik...,kj...->ij...", x, y)


def inv_soa(m):
    """Inverse of (d, d, B) batch-minor matrices, any d (Schur recursion over
    the d=1/2 cofactor bases; d is static so the recursion unrolls at trace
    time into a handful of einsums — small graphs, full-lane VPU work)."""
    d = m.shape[0]
    if d == 1:
        return 1.0 / m
    if d == 2:
        return _inv2_soa(m)
    k = d // 2
    a = m[:k, :k]
    b = m[:k, k:]
    c = m[k:, :k]
    dd = m[k:, k:]
    a_inv = inv_soa(a)
    ca = _mm_soa(c, a_inv)
    schur = dd - _mm_soa(ca, b)
    s_inv = inv_soa(schur)
    ab = _mm_soa(a_inv, b)
    top_left = a_inv + _mm_soa(_mm_soa(ab, s_inv), ca)
    top_right = -_mm_soa(ab, s_inv)
    bot_left = -_mm_soa(s_inv, ca)
    top = jnp.concatenate([top_left, top_right], axis=1)
    bot = jnp.concatenate([bot_left, s_inv], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def inv_soa_scaled(m):
    """inv_soa with the small_inv-style mean-|diagonal| normalization, keeping
    cofactor determinants of vague (1e12-scaled) matrices inside fp32 range."""
    d = m.shape[0]
    diag = jnp.diagonal(m, axis1=0, axis2=1)          # (..., B, d) -> last two
    scale = jnp.mean(jnp.abs(diag), axis=-1)
    scale = jnp.where(scale > 0, scale, 1.0)
    return inv_soa(m / scale) / scale
