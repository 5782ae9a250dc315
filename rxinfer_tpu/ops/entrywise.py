"""Entry-wise (fully unpacked) small-matrix algebra for scan bodies.

Why this exists: inside ``lax.scan`` / ``lax.associative_scan`` bodies, XLA on
TPU fails to fuse the ``stack``/``concatenate``/``slice`` chains that array-form
cofactor inverses (ops/smallmat.py) produce — a single ``inv_soa`` in a scan
body measured 747 us/step on v5e-lite while a pure-einsum step cost 0.56 us
(fetch-synced scan-body slope probe).  Representing each d x d matrix as a
plain Python
list-of-lists of ``(...,)``-shaped arrays turns every operation — including the
Schur-complement inverse — into straight-line scalar arithmetic on whole
arrays, which XLA fuses into a handful of kernels regardless of loop context.

All helpers treat the *entries* as arbitrary broadcastable arrays: a chain of
T=10k steps uses entries of shape ``(T,)`` (associative scan), a streaming
filter over B chains uses ``(B,)`` (scan carry), and everything vmaps.

Matrices are ``list[list[array]]``; vectors are ``list[array]``.  d is a
static Python int, so loops unroll at trace time.
"""

from __future__ import annotations

import jax.numpy as jnp


# -- conversion --------------------------------------------------------------------

def unstack_mat(m):
    """(..., d, d) array -> d x d list-of-lists of (...) entries."""
    d = m.shape[-1]
    return [[m[..., i, j] for j in range(d)] for i in range(d)]


def unstack_vec(v):
    d = v.shape[-1]
    return [v[..., i] for i in range(d)]


def stack_mat(m):
    return jnp.stack([jnp.stack(row, axis=-1) for row in m], axis=-2)


def stack_vec(v):
    return jnp.stack(v, axis=-1)


# -- algebra -----------------------------------------------------------------------

def mat_eye(d, like):
    one = jnp.ones_like(like)
    zero = jnp.zeros_like(like)
    return [[one if i == j else zero for j in range(d)] for i in range(d)]


def mat_zeros(d, like):
    zero = jnp.zeros_like(like)
    return [[zero for _ in range(d)] for _ in range(d)]


def vec_zeros(d, like):
    zero = jnp.zeros_like(like)
    return [zero for _ in range(d)]


def mat_add(a, b):
    return [[x + y for x, y in zip(ra, rb)] for ra, rb in zip(a, b)]


def mat_sub(a, b):
    return [[x - y for x, y in zip(ra, rb)] for ra, rb in zip(a, b)]


def mat_neg(a):
    return [[-x for x in row] for row in a]


def mat_scale(a, s):
    return [[x * s for x in row] for row in a]


def mat_t(a):
    d = len(a)
    return [[a[j][i] for j in range(d)] for i in range(d)]


def mat_mul(a, b):
    n, k, m = len(a), len(b), len(b[0])
    return [
        [sum(a[i][p] * b[p][j] for p in range(k)) for j in range(m)]
        for i in range(n)
    ]


def mat_vec(a, v):
    return [sum(a[i][j] * v[j] for j in range(len(v))) for i in range(len(a))]


def vec_add(a, b):
    return [x + y for x, y in zip(a, b)]


def vec_sub(a, b):
    return [x - y for x, y in zip(a, b)]


def mat_sym(a):
    d = len(a)
    return [[0.5 * (a[i][j] + a[j][i]) for j in range(d)] for i in range(d)]


# -- inverses (d <= 4, Schur recursion; pure scalar arithmetic) ----------------------

def _inv1(a):
    return [[1.0 / a[0][0]]]


def _inv2_e(a):
    det = a[0][0] * a[1][1] - a[0][1] * a[1][0]
    inv_det = 1.0 / det
    return [[a[1][1] * inv_det, -a[0][1] * inv_det],
            [-a[1][0] * inv_det, a[0][0] * inv_det]]


def _blocks(m, k):
    d = len(m)
    a = [row[:k] for row in m[:k]]
    b = [row[k:] for row in m[:k]]
    c = [row[:k] for row in m[k:]]
    dd = [row[k:] for row in m[k:]]
    return a, b, c, dd


def _join(tl, tr, bl, br):
    top = [rt + rr for rt, rr in zip(tl, tr)]
    bot = [rb + rr for rb, rr in zip(bl, br)]
    return top + bot


def mat_inv(m):
    """Inverse of a d x d entry-wise matrix, d <= 4 (Schur complements).

    No normalization guard: callers in the scan hot paths operate on
    well-scaled posterior/filter quantities.  Use ``mat_inv_scaled`` when
    vague (1e12) magnitudes may appear."""
    d = len(m)
    if d == 1:
        return _inv1(m)
    if d == 2:
        return _inv2_e(m)
    k = d // 2
    a, b, c, dd = _blocks(m, k)
    a_inv = mat_inv(a)
    ca = mat_mul(c, a_inv)
    schur = mat_sub(dd, mat_mul(ca, b))
    s_inv = mat_inv(schur)
    ab = mat_mul(a_inv, b)
    tl = mat_add(a_inv, mat_mul(mat_mul(ab, s_inv), ca))
    tr = mat_neg(mat_mul(ab, s_inv))
    bl = mat_neg(mat_mul(s_inv, ca))
    return _join(tl, tr, bl, s_inv)


def mat_inv_scaled(m):
    """mat_inv with the smallmat-style mean-|diagonal| normalization, keeping
    determinants of vague (1e12-scaled) matrices inside fp32 range."""
    d = len(m)
    scale = sum(jnp.abs(m[i][i]) for i in range(d)) / d
    scale = jnp.where(scale > 0, scale, 1.0)
    inv_s = 1.0 / scale
    ms = [[x * inv_s for x in row] for row in m]
    inv = mat_inv(ms)
    return [[x * inv_s for x in row] for row in inv]


# -- symmetric-matrix variants (upper-triangle compute, aliased full views) ---------
#
# For a symmetric d x d, computing only the d(d+1)/2 upper-triangle entries and
# ALIASING the lower triangle to the same traced arrays cuts the VPU op count
# of the sandwich product and the Schur inverse by ~30% — the fused Pallas
# filter/smoother kernels are VPU-bound, so this is a direct speedup.

def sym_alias(m):
    """Force lower triangle to alias the upper (list identity, no compute)."""
    d = len(m)
    return [[m[i][j] if i <= j else m[j][i] for j in range(d)]
            for i in range(d)]


def sandwich_sym(f, p, q):
    """F P F^T + Q for symmetric P, Q -> symmetric (aliased) result."""
    d = len(f)
    m = mat_mul(f, p)
    out = [[None] * d for _ in range(d)]
    for i in range(d):
        for j in range(i, d):
            out[i][j] = q[i][j] + sum(m[i][kk] * f[j][kk] for kk in range(d))
            out[j][i] = out[i][j]
    return out


def sym_inv(m):
    """Inverse of a symmetric entry-wise matrix (Schur recursion computing
    upper-triangle blocks only; result aliased-symmetric)."""
    d = len(m)
    if d == 1:
        return [[1.0 / m[0][0]]]
    if d == 2:
        det = m[0][0] * m[1][1] - m[0][1] * m[0][1]
        inv_det = 1.0 / det
        x00 = m[1][1] * inv_det
        x01 = -m[0][1] * inv_det
        x11 = m[0][0] * inv_det
        return [[x00, x01], [x01, x11]]
    k = d // 2
    mm = d - k
    a = [row[:k] for row in m[:k]]
    b = [row[k:] for row in m[:k]]
    dd = [row[k:] for row in m[k:]]
    a_inv = sym_inv(a)
    ab = mat_mul(a_inv, b)                       # X = A^-1 B, k x mm
    sc = [[None] * mm for _ in range(mm)]
    for i in range(mm):
        for j in range(i, mm):
            sc[i][j] = dd[i][j] - sum(b[p][i] * ab[p][j] for p in range(k))
            sc[j][i] = sc[i][j]
    s_inv = sym_inv(sc)
    xs = mat_mul(ab, s_inv)                      # X S^-1, k x mm
    tl = [[None] * k for _ in range(k)]
    for i in range(k):
        for j in range(i, k):
            tl[i][j] = a_inv[i][j] + sum(xs[i][p] * ab[j][p]
                                         for p in range(mm))
            tl[j][i] = tl[i][j]
    top = [tl[i] + [-xs[i][p] for p in range(mm)] for i in range(k)]
    bot = [[-xs[i][p] for i in range(k)] + s_inv[p] for p in range(mm)]
    return top + bot


def sym_inv_scaled(m):
    """sym_inv with the mean-|diagonal| normalization of mat_inv_scaled."""
    d = len(m)
    scale = sum(jnp.abs(m[i][i]) for i in range(d)) / d
    scale = jnp.where(scale > 0, scale, 1.0)
    inv_s = 1.0 / scale
    ms = sym_alias([[m[i][j] * inv_s if i <= j else None for j in range(d)]
                    for i in range(d)])
    inv = sym_inv(ms)
    return sym_alias([[inv[i][j] * inv_s if i <= j else None
                       for j in range(d)] for i in range(d)])


def mat_logdet(m):
    """log|det| via the same Schur recursion (PD assumed), d <= 4."""
    d = len(m)
    scale = sum(jnp.abs(m[i][i]) for i in range(d)) / d
    scale = jnp.where(scale > 0, scale, 1.0)
    inv_s = 1.0 / scale
    ms = [[x * inv_s for x in row] for row in m]

    def det(mm):
        dd = len(mm)
        if dd == 1:
            return mm[0][0]
        if dd == 2:
            return mm[0][0] * mm[1][1] - mm[0][1] * mm[1][0]
        k = dd // 2
        a, b, c, d4 = _blocks(mm, k)
        schur = mat_sub(d4, mat_mul(mat_mul(c, mat_inv(a)), b))
        return det(a) * det(schur)

    return jnp.log(jnp.clip(det(ms), 1e-37)) + d * jnp.log(scale)
