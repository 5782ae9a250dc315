"""Exact Gaussian-chain inference as parallel (associative) scans.

This is the TPU-native replacement for the reference's sequential message
propagation over LGSSM chains (reference: full-graph sum-product smoothing,
benchmarks/ notebook; sequential push streams limited by stack depth,
src/rocket.jl:51-75).  Instead of T sequential message updates we run
``jax.lax.associative_scan`` over Gaussian conditional operators — O(log T) depth,
fully parallel across the time axis, mapping onto the TPU's VPU/MXU with large
fused batched ops.

Math: Särkkä & García-Fernández, "Temporal Parallelization of Bayesian Smoothers"
(IEEE TAC 2021) — filtering elements (A, b, C, eta, J) with the associative
composition of conditional Gaussians; smoothing elements (E, g, L).  Extended here
with (1) affine dynamics offsets b_t, (2) *information-form* per-step evidence
(xi_t, W_t), which uniformly encodes emissions, external VMP messages from
neighboring factors, and missing observations (W=0) — the message-passing view of
a Kalman smoother.

All functions are time-major and vmap-able over leading batch axes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..dists.gaussian import _symmetrize, pd_inverse
from .smallmat import small_inv, small_logdet, small_solve


class ChainParams(NamedTuple):
    """Time-varying (or broadcast) LGSSM parameters.

    x_0 ~ N(m0, P0) ;  x_t = F_t x_{t-1} + b_t + w_t, w_t ~ N(0, Q_t)  for t>=1;
    per-step evidence on x_t in information form: exp(xi_t^T x - 1/2 x^T W_t x).

    F, b, Q are indexed by t-1 (transition into step t): shapes (T-1, d, d) etc.
    xi: (T, d); W: (T, d, d).
    """

    m0: jnp.ndarray
    P0: jnp.ndarray
    F: jnp.ndarray
    b: jnp.ndarray
    Q: jnp.ndarray
    xi: jnp.ndarray
    W: jnp.ndarray


class SmoothResult(NamedTuple):
    means: jnp.ndarray        # (T, d) smoothed means  E[x_t | all evidence]
    covs: jnp.ndarray         # (T, d, d) smoothed covariances
    filt_means: jnp.ndarray   # (T, d) filtered means
    filt_covs: jnp.ndarray    # (T, d, d)
    cross: jnp.ndarray        # (T-1, d, d) Cov(x_t, x_{t+1} | evidence)


def _solve(a, b):
    """Batched general solve a @ x = b (a not necessarily symmetric).

    Closed-form cofactor path for d <= 4 (ops/smallmat.py): XLA lowers batched
    LU on tiny matrices to sequential per-matrix loops on TPU — fetch-synced
    measurement on v5e-lite showed 35 ms for one batched (10k,4,4) solve stage
    vs <1 ms closed-form.  (An earlier measurement claiming the opposite used
    jax.block_until_ready, which does NOT actually block through the remote
    tunnel.)  d > 4 falls back to LU inside small_solve."""
    return small_solve(a, b)


# ---------------------------------------------------------------------------------
# Filtering: associative elements and composition
# ---------------------------------------------------------------------------------

def _make_filter_elements(p: ChainParams):
    d = p.m0.shape[-1]
    eye = jnp.eye(d, dtype=p.m0.dtype)

    # Element 0: exact filtered state at t=0 (prior × evidence_0).
    w_post0 = pd_inverse(p.P0) + p.W[0]
    c0 = pd_inverse(w_post0)
    m0f = c0 @ (_solve(p.P0, p.m0[..., None])[..., 0] + p.xi[0])
    a0 = jnp.zeros((d, d), p.m0.dtype)
    eta0 = jnp.zeros((d,), p.m0.dtype)
    j0 = jnp.zeros((d, d), p.m0.dtype)

    # Elements t>=1 from (F, b, Q, xi_t, W_t).  Since Q and W are symmetric,
    # (I + W Q) = (I + Q W)^T — one closed-form inverse serves both solves.
    def make(f, b, q, xi, w):
        minv = small_inv(eye + q @ w)        # (I + Q W)^{-1}
        a = minv @ f                         # (I+QW)^{-1} F
        belem = minv @ (b + q @ xi)          # (I+QW)^{-1} (b + Q xi)
        c = minv @ q                         # (I+QW)^{-1} Q
        minv_t = minv.T                      # (I + W Q)^{-1}
        eta = f.T @ (minv_t @ (xi - w @ b))
        j = f.T @ (minv_t @ w) @ f
        return a, belem, _symmetrize(c), eta, _symmetrize(j)

    a_r, b_r, c_r, eta_r, j_r = jax.vmap(make)(p.F, p.b, p.Q, p.xi[1:], p.W[1:])

    A = jnp.concatenate([a0[None], a_r], axis=0)
    B = jnp.concatenate([m0f[None], b_r], axis=0)
    C = jnp.concatenate([c0[None], c_r], axis=0)
    ETA = jnp.concatenate([eta0[None], eta_r], axis=0)
    J = jnp.concatenate([j0[None], j_r], axis=0)
    return A, B, C, ETA, J


def _filter_compose(elem_i, elem_j):
    """Associative composition: elem_i (earlier) ⊗ elem_j (later).

    Särkkä & García-Fernández Lemma 8 (extended with offsets already folded into
    b / eta at element construction)."""
    a_i, b_i, c_i, eta_i, j_i = elem_i
    a_j, b_j, c_j, eta_j, j_j = elem_j
    d = a_i.shape[-1]
    eye = jnp.eye(d, dtype=a_i.dtype)

    # C_i and J_j are symmetric, so (I + J_j C_i) = (I + C_i J_j)^T: one
    # closed-form inverse (TPU-fast elementwise cofactors, smallmat.py) covers
    # all five solves of the lemma.
    m = eye + c_i @ j_j                                    # (I + C_i J_j)
    minv = small_inv(m)
    minv_t = jnp.swapaxes(minv, -1, -2)                    # (I + J_j C_i)^{-1}

    a = a_j @ (minv @ a_i)
    b = a_j @ (minv @ (b_i + c_i @ eta_j)) + b_j
    c = a_j @ (minv @ c_i) @ jnp.swapaxes(a_j, -1, -2) + c_j

    a_i_t = jnp.swapaxes(a_i, -1, -2)
    eta = a_i_t @ (minv_t @ (eta_j - j_j @ b_i)) + eta_i
    j = a_i_t @ (minv_t @ j_j) @ a_i + j_i

    return a, b, _symmetrize(c), eta, _symmetrize(j)


def _cast_tree(tree, dtype):
    return jax.tree_util.tree_map(lambda x: x.astype(dtype), tree)


def _compose_with_payload(compose, payload_dtype):
    """Wrap an associative compose so the scan's intermediate element storage is
    ``payload_dtype`` (bf16 message payloads) while the arithmetic stays fp32
    (BASELINE.json: "message payloads run in bf16 with fp32 accumulation")."""
    if payload_dtype is None:
        return compose

    def fn(a, b):
        out = compose(_cast_tree(a, jnp.float32), _cast_tree(b, jnp.float32))
        return _cast_tree(out, payload_dtype)

    return fn


def parallel_filter(p: ChainParams, payload_dtype=None):
    """Parallel Kalman filter: returns filtered means (T,d) and covs (T,d,d).

    ``payload_dtype=jnp.bfloat16`` halves the HBM traffic of the scan levels at
    ~1e-2 relative accuracy (validated in tests)."""
    elems = _make_filter_elements(p)
    if payload_dtype is not None:
        elems = _cast_tree(elems, payload_dtype)
    composed = jax.lax.associative_scan(
        jax.vmap(_compose_with_payload(_filter_compose, payload_dtype)),
        elems, axis=0,
    )
    _, b, c, _, _ = composed
    return b.astype(jnp.float32), c.astype(jnp.float32)


def sequential_filter(p: ChainParams):
    """Reference sequential ``lax.scan`` filter (same outputs as parallel_filter).

    Useful when T is small or per-chain batching already saturates the chip."""
    d = p.m0.shape[-1]

    w0 = pd_inverse(p.P0) + p.W[0]
    c0 = pd_inverse(w0)
    m0f = c0 @ (_solve(p.P0, p.m0[..., None])[..., 0] + p.xi[0])

    def step(carry, inp):
        m, c = carry
        f, b, q, xi, w = inp
        m_pred = f @ m + b
        p_pred = _symmetrize(f @ c @ f.T + q)
        w_post = pd_inverse(p_pred) + w
        c_new = _symmetrize(pd_inverse(w_post))
        m_new = c_new @ (_solve(p_pred, m_pred[..., None])[..., 0] + xi)
        return (m_new, c_new), (m_new, c_new)

    (_, _), (ms, cs) = jax.lax.scan(
        step, (m0f, c0), (p.F, p.b, p.Q, p.xi[1:], p.W[1:])
    )
    means = jnp.concatenate([m0f[None], ms], axis=0)
    covs = jnp.concatenate([c0[None], cs], axis=0)
    return means, covs


# ---------------------------------------------------------------------------------
# Smoothing
# ---------------------------------------------------------------------------------

def _make_smoother_elements(p: ChainParams, filt_means, filt_covs):
    """Elements (E, g, L) for the backward associative pass."""

    def make(mf, cf, f, b, q):
        p_pred = _symmetrize(f @ cf @ f.T + q)
        # E = Cf F^T P_pred^{-1}  (RTS gain)
        e = jnp.swapaxes(_solve(p_pred, f @ cf), -1, -2)
        g = mf - e @ (f @ mf + b)
        l = _symmetrize(cf - e @ p_pred @ jnp.swapaxes(e, -1, -2))
        return e, g, l

    e_r, g_r, l_r = jax.vmap(make)(
        filt_means[:-1], filt_covs[:-1], p.F, p.b, p.Q
    )
    d = p.m0.shape[-1]
    e_last = jnp.zeros((1, d, d), p.m0.dtype)
    g_last = filt_means[-1][None]
    l_last = filt_covs[-1][None]
    E = jnp.concatenate([e_r, e_last], axis=0)
    G = jnp.concatenate([g_r, g_last], axis=0)
    L = jnp.concatenate([l_r, l_last], axis=0)
    return E, G, L


def _smooth_compose(elem_later, elem_earlier):
    """Composition for the reverse scan.

    Element a_k is the affine map (m,P)_{k+1|T} → (m,P)_{k|T}:
    m_k = E_k m_{k+1} + g_k.  The suffix composite a_k ⊗ a_{k+1..T} is therefore
    E_earlier applied to the later suffix.  ``lax.associative_scan(reverse=True)``
    feeds (later-chunk, earlier-chunk) in that order."""
    e_i, g_i, l_i = elem_later     # suffix already composed (later steps)
    e_j, g_j, l_j = elem_earlier   # earlier step
    e = e_j @ e_i
    g = e_j @ g_i + g_j
    l = e_j @ l_i @ jnp.swapaxes(e_j, -1, -2) + l_j
    return e, g, _symmetrize(l)


def parallel_smoother(p: ChainParams, payload_dtype=None) -> SmoothResult:
    """Full parallel Kalman smoother: filter + backward pass + pairwise
    cross-covariances (needed for structured Bethe energies and EM)."""
    filt_means, filt_covs = parallel_filter(p, payload_dtype)
    elems = _make_smoother_elements(p, filt_means, filt_covs)
    if payload_dtype is not None:
        elems = _cast_tree(elems, payload_dtype)
    e_all, g_all, l_all = jax.lax.associative_scan(
        jax.vmap(_compose_with_payload(_smooth_compose, payload_dtype)),
        elems, axis=0, reverse=True
    )
    e_all = e_all.astype(jnp.float32)
    g_all = g_all.astype(jnp.float32)
    l_all = l_all.astype(jnp.float32)
    means, covs = g_all, l_all

    # Cross covariance Cov(x_t, x_{t+1}) = E_t P_{t+1|T}
    e_step = elems[0][:-1]
    cross = e_step @ covs[1:]
    return SmoothResult(means, covs, filt_means, filt_covs, cross)


def sequential_smoother(p: ChainParams) -> SmoothResult:
    filt_means, filt_covs = sequential_filter(p)

    def step(carry, inp):
        m_next, c_next = carry
        mf, cf, f, b, q = inp
        p_pred = _symmetrize(f @ cf @ f.T + q)
        e = jnp.swapaxes(_solve(p_pred, f @ cf), -1, -2)
        m = mf + e @ (m_next - (f @ mf + b))
        c = _symmetrize(cf + e @ (c_next - p_pred) @ jnp.swapaxes(e, -1, -2))
        cross = e @ c_next
        return (m, c), (m, c, cross)

    init = (filt_means[-1], filt_covs[-1])
    (_, _), (ms, cs, crosses) = jax.lax.scan(
        step,
        init,
        (filt_means[:-1], filt_covs[:-1], p.F, p.b, p.Q),
        reverse=True,
    )
    means = jnp.concatenate([ms, filt_means[-1][None]], axis=0)
    covs = jnp.concatenate([cs, filt_covs[-1][None]], axis=0)
    return SmoothResult(means, covs, filt_means, filt_covs, crosses)


# ---------------------------------------------------------------------------------
# Log evidence (for moment-form emissions): prediction-error decomposition
# ---------------------------------------------------------------------------------

def chain_log_evidence(
    p: ChainParams,
    filt_means: jnp.ndarray,
    filt_covs: jnp.ndarray,
    H: jnp.ndarray,
    c: jnp.ndarray,
    R: jnp.ndarray,
    y: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """log Z = sum_t log N(y_t; H m_{t|t-1} + c, H P_{t|t-1} H^T + R).

    Computed as one batched post-pass over the filtered results (all T solved
    simultaneously — no sequential dependency).  For a tree-structured chain this
    equals -BetheFE at the BP fixed point, which the test-suite asserts
    (reference conformance: test/models/statespace/mlgssm_test.jl:128)."""
    m_pred = jnp.concatenate(
        [p.m0[None], jnp.einsum("tij,tj->ti", p.F, filt_means[:-1]) + p.b], axis=0
    )
    p_pred = jnp.concatenate(
        [
            p.P0[None],
            jnp.einsum("tij,tjk,tlk->til", p.F, filt_covs[:-1], p.F) + p.Q,
        ],
        axis=0,
    )
    mu_y = jnp.einsum("tij,tj->ti", H, m_pred) + c
    s = jnp.einsum("tij,tjk,tlk->til", H, p_pred, H) + R
    diff = y - mu_y
    s = _symmetrize(s)
    if s.shape[-1] <= 4:
        maha = jnp.sum(diff * small_solve(s, diff), axis=-1)
        logdet = small_logdet(s)
    else:
        chol = jnp.linalg.cholesky(s)
        sol = jax.scipy.linalg.solve_triangular(
            chol, diff[..., None], lower=True
        )[..., 0]
        maha = jnp.sum(sol * sol, axis=-1)
        logdet = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1
        )
    dy = y.shape[-1]
    ll = -0.5 * (dy * jnp.log(2.0 * jnp.pi) + logdet + maha)
    if mask is not None:
        ll = jnp.where(mask, ll, 0.0)
    return jnp.sum(ll, axis=-1)


# ---------------------------------------------------------------------------------
# Single-step filtering update (streaming / autoupdates fast path)
# ---------------------------------------------------------------------------------

def filter_step(m, P, F, b, Q, xi, W):
    """One predict+update in information form; batched over leading axes.

    The streaming-engine hot op: posterior_t = f(prior_{t-1}, y_t) — the compiled
    equivalent of the reference's single-step model + @autoupdates
    (benchmarks notebook cell 7)."""
    m_pred = jnp.einsum("...ij,...j->...i", F, m) + b
    p_pred = _symmetrize(jnp.einsum("...ij,...jk,...lk->...il", F, P, F) + Q)
    p_pred_inv = _symmetrize(small_inv(p_pred))
    w_post = p_pred_inv + W
    p_new = _symmetrize(small_inv(w_post))
    xi_tot = jnp.einsum("...ij,...j->...i", p_pred_inv, m_pred) + xi
    m_new = jnp.einsum("...ij,...j->...i", p_new, xi_tot)
    return m_new, p_new
