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
    return small_solve(a, b, matrix=True)


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


# ---------------------------------------------------------------------------------
# Batch-minor (SoA) scan paths for small d
#
# The associative-scan elements are tiny d x d matrices.  Stored as (T, d, d)
# arrays, each 4x4 matrix pads to a full (8, 128) TPU tile inside the scan
# levels — ~64x wasted HBM traffic and VPU lanes.  Transposing to (d, d, T)
# puts the time axis on the lanes: every compose is a handful of einsums
# batched over full-width vectors, and the closed-form inverse is
# ops/smallmat.inv_soa.  (A list-of-(T,)-entries pytree representation was
# tried first — numerically identical but the per-entry leaves blow the
# unrolled scan graph up to ~10k jaxprs eqns and minutes of XLA compile; the
# (d, d, T)-axes form keeps the graph as small as the naive (T, d, d) one.)
#
# Leading batch axes of ChainParams are handled NATIVELY: (B, T, d, d) becomes
# (d, d, B, T) with (B, T) on the (sublane, lane) tiles — full-tile utilization.
# Prefer passing batched params directly over jax.vmap(parallel_smoother):
# vmap pushes the batch dim in front of the tiny d/1 minor dims, wasting tiles.
# ---------------------------------------------------------------------------------

from .smallmat import inv_soa_scaled


def _to_soa_mat(x):   # (..., T, d, d) -> (d, d, ..., T)
    return jnp.moveaxis(x, (-2, -1, -3), (0, 1, -1))


def _to_soa_vec(x):   # (..., T, d) -> (d, 1, ..., T): vectors as single-column
    v = jnp.moveaxis(x, (-1, -2), (0, -1))   # matrices so every scan leaf
    return v[:, None]                        # shares the scanned-axis index


def _from_soa_mat(x):
    return jnp.moveaxis(x, (0, 1, -1), (-2, -1, -3))


def _from_soa_vec(x):  # (d, 1, ..., T) -> (..., T, d)
    return jnp.moveaxis(x[:, 0], (0, -1), (-1, -2))


def _mm(x, y):
    return jnp.einsum("ik...,kj...->ij...", x, y)


_mv = _mm  # vectors are (d, 1, N) matrices


def _t(x):
    return jnp.swapaxes(x, 0, 1)


def _sym_soa(x):
    return 0.5 * (x + _t(x))


def _eye_plus(m):
    d = m.shape[0]
    return m + jnp.eye(d, dtype=m.dtype)[(...,) + (None,) * (m.ndim - 2)]


def _make_filter_elements_soa(p: ChainParams):
    """Filter elements built directly in the (d, d, ..., T) layout — every op is
    full-width elementwise VPU work; nothing materializes in (T, d, d) form."""
    f = _to_soa_mat(p.F)
    b = _to_soa_vec(p.b)
    q = _to_soa_mat(p.Q)
    xi_r = _to_soa_vec(p.xi[..., 1:, :])
    w_r = _to_soa_mat(p.W[..., 1:, :, :])

    minv = inv_soa_scaled(_eye_plus(_mm(q, w_r)))      # (I + Q W)^{-1}
    minv_t = _t(minv)                                  # (I + W Q)^{-1}
    f_t = _t(f)
    a = _mm(minv, f)
    belem = _mv(minv, b + _mv(q, xi_r))
    c = _sym_soa(_mm(minv, q))
    eta = _mv(f_t, _mv(minv_t, xi_r - _mv(w_r, b)))
    j = _sym_soa(_mm(f_t, _mm(_mm(minv_t, w_r), f)))

    # Element 0: exact filtered state at t=0 (prior × evidence_0), dense math
    # on a single (..., d, d) matrix, then appended as a length-1 time slice.
    w_post0 = pd_inverse(p.P0) + p.W[..., 0, :, :]
    c0 = pd_inverse(w_post0)
    rhs0 = small_solve(p.P0, p.m0, matrix=False) + p.xi[..., 0, :]
    m0f = jnp.einsum("...ij,...j->...i", c0, rhs0)
    z_m = jnp.zeros_like(c0)

    A = jnp.concatenate([_to_soa_mat(z_m[..., None, :, :]), a], axis=-1)
    B = jnp.concatenate([_to_soa_vec(m0f[..., None, :]), belem], axis=-1)
    C = jnp.concatenate([_to_soa_mat(c0[..., None, :, :]), c], axis=-1)
    ETA = jnp.concatenate([_to_soa_vec(jnp.zeros_like(m0f)[..., None, :]), eta],
                          axis=-1)
    J = jnp.concatenate([_to_soa_mat(z_m[..., None, :, :]), j], axis=-1)
    return A, B, C, ETA, J


def _make_smoother_elements_soa(p: ChainParams, bf_soa, cf_soa):
    """Smoother elements (E, g, L) in SoA form from SoA filtered moments."""
    f = _to_soa_mat(p.F)
    b = _to_soa_vec(p.b)
    q = _to_soa_mat(p.Q)
    mf = bf_soa[..., :-1]
    cf = cf_soa[..., :-1]

    fcf = _mm(f, cf)
    p_pred = _sym_soa(_mm(fcf, _t(f)) + q)
    e = _t(_mm(inv_soa_scaled(p_pred), fcf))          # RTS gain Cf F^T P_pred^{-1}
    g = mf - _mv(e, _mv(f, mf) + b)
    l = _sym_soa(cf - _mm(_mm(e, p_pred), _t(e)))

    E = jnp.concatenate([e, jnp.zeros_like(e[..., :1])], axis=-1)
    G = jnp.concatenate([g, bf_soa[..., -1:]], axis=-1)
    L = jnp.concatenate([l, cf_soa[..., -1:]], axis=-1)
    return (E, G, L), e


def _filter_compose_soa(elem_i, elem_j):
    """_filter_compose on (d, d, N)/(d, N) batch-minor elements."""
    a_i, b_i, c_i, eta_i, j_i = elem_i
    a_j, b_j, c_j, eta_j, j_j = elem_j

    minv = inv_soa_scaled(_eye_plus(_mm(c_i, j_j)))    # (I + C_i J_j)^{-1}
    minv_t = _t(minv)                                  # (I + J_j C_i)^{-1}

    a = _mm(a_j, _mm(minv, a_i))
    b = _mv(a_j, _mv(minv, b_i + _mv(c_i, eta_j))) + b_j
    c = _mm(_mm(a_j, _mm(minv, c_i)), _t(a_j)) + c_j

    a_i_t = _t(a_i)
    eta = _mv(a_i_t, _mv(minv_t, eta_j - _mv(j_j, b_i))) + eta_i
    j = _mm(a_i_t, _mm(_mm(minv_t, j_j), a_i)) + j_i

    return a, b, _sym_soa(c), eta, _sym_soa(j)


def _smooth_compose_soa(elem_later, elem_earlier):
    e_i, g_i, l_i = elem_later
    e_j, g_j, l_j = elem_earlier
    e = _mm(e_j, e_i)
    g = _mv(e_j, g_i) + g_j
    l = _mm(_mm(e_j, l_i), _t(e_j)) + l_j
    return e, g, _sym_soa(l)


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


def _parallel_filter_soa(p: ChainParams, payload_dtype=None):
    """SoA filter scan; returns filtered (means, covs) still in SoA layout."""
    soa = _make_filter_elements_soa(p)
    if payload_dtype is not None:
        soa = _cast_tree(soa, payload_dtype)
    composed = jax.lax.associative_scan(
        _compose_with_payload(_filter_compose_soa, payload_dtype),
        soa, axis=soa[0].ndim - 1,
    )
    _, b, c, _, _ = composed
    return b.astype(jnp.float32), c.astype(jnp.float32)


def parallel_filter(p: ChainParams, payload_dtype=None):
    """Parallel Kalman filter: filtered means (..., T, d) and covs (..., T, d, d).

    Leading batch axes are handled natively (preferred over jax.vmap — see the
    SoA note above).  ``payload_dtype=jnp.bfloat16`` halves the HBM traffic of
    the scan levels at ~1e-2 relative accuracy (validated in tests)."""
    d = p.m0.shape[-1]
    if d <= 16:
        # SoA batch-minor layout (round-5: gate widened from d<=8 — inv_soa's
        # Schur recursion is d-generic and measured accurate to the float64
        # oracle at d=16; the AoS fallback's batched tiny-matrix ops are the
        # TPU trap, see smallmat.py docstring)
        b, c = _parallel_filter_soa(p, payload_dtype)
        return _from_soa_vec(b), _from_soa_mat(c)
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
    d = p.m0.shape[-1]
    if d <= 16:
        bf_soa, cf_soa = _parallel_filter_soa(p, payload_dtype)
        soa, e_step = _make_smoother_elements_soa(p, bf_soa, cf_soa)
        if payload_dtype is not None:
            soa = _cast_tree(soa, payload_dtype)
        _, g_all, l_all = jax.lax.associative_scan(
            _compose_with_payload(_smooth_compose_soa, payload_dtype),
            soa, axis=soa[0].ndim - 1, reverse=True,
        )
        l_all = l_all.astype(jnp.float32)
        # Cross covariance Cov(x_t, x_{t+1}) = E_t P_{t+1|T}
        cross = _from_soa_mat(_mm(e_step.astype(jnp.float32), l_all[..., 1:]))
        return SmoothResult(
            _from_soa_vec(g_all).astype(jnp.float32),
            _from_soa_mat(l_all),
            _from_soa_vec(bf_soa),
            _from_soa_mat(cf_soa),
            cross,
        )

    filt_means, filt_covs = parallel_filter(p, payload_dtype)
    elems = _make_smoother_elements(p, filt_means, filt_covs)
    e_step = elems[0][:-1]
    if payload_dtype is not None:
        elems = _cast_tree(elems, payload_dtype)
    _, g_all, l_all = jax.lax.associative_scan(
        jax.vmap(_compose_with_payload(_smooth_compose, payload_dtype)),
        elems, axis=0, reverse=True
    )
    means = g_all.astype(jnp.float32)
    covs = l_all.astype(jnp.float32)
    cross = e_step.astype(jnp.float32) @ covs[1:]
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
        maha = jnp.sum(diff * small_solve(s, diff, matrix=False), axis=-1)
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
