"""Discrete-chain (HMM) forward-backward in log space.

TPU-native exact sum-product over a categorical Markov chain given expected
log-potentials — the structured-VMP inner solver for HMMs (reference:
DiscreteTransition + structured mean-field constraint,
test/models/statespace/hmm_tests.jl).  Provides a sequential ``lax.scan`` version
and an O(log T) associative version over the (max,+)-free log-matmul semiring.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp


class DiscreteChainResult(NamedTuple):
    gammas: jnp.ndarray   # (T, K) singleton marginals q(s_t)
    xis: jnp.ndarray      # (T-1, K, K) pairwise marginals q(s_{t+1}, s_t) [out, in]
    logZ: jnp.ndarray     # scalar log partition of the chain potentials


def _log_matmul(a, b):
    """(a ⊙ b)[i,j] = logsumexp_k a[i,k] + b[k,j]."""
    return logsumexp(a[..., :, :, None] + b[..., None, :, :], axis=-2)


def forward_backward(
    log_prior: jnp.ndarray,    # (K,) log prior potential on s_0
    log_trans: jnp.ndarray,    # (T-1, K, K) E[log A_t] with [out, in] convention
    log_evidence: jnp.ndarray, # (T, K) per-step evidence (emissions + ext messages)
) -> DiscreteChainResult:
    """Sequential scan forward-backward (alpha-beta) in log space."""
    a0 = log_prior + log_evidence[0]

    def fwd(alpha, inp):
        lt, le = inp
        nxt = logsumexp(lt + alpha[None, :], axis=-1) + le
        return nxt, nxt

    _, alphas_rest = jax.lax.scan(fwd, a0, (log_trans, log_evidence[1:]))
    alphas = jnp.concatenate([a0[None], alphas_rest], axis=0)

    bT = jnp.zeros_like(a0)

    def bwd(beta, inp):
        lt, le = inp
        prev = logsumexp(lt + (beta + le)[:, None], axis=0)
        return prev, prev

    _, betas_rest = jax.lax.scan(
        bwd, bT, (log_trans, log_evidence[1:]), reverse=True
    )
    betas = jnp.concatenate([betas_rest, bT[None]], axis=0)

    logZ = logsumexp(alphas[-1])
    gammas = jax.nn.softmax(alphas + betas, axis=-1)
    # xi_t[i,j] ∝ alpha_t[j] * trans[i,j] * evidence_{t+1}[i] * beta_{t+1}[i]
    log_xi = (
        alphas[:-1][:, None, :]
        + log_trans
        + (log_evidence[1:] + betas[1:])[:, :, None]
    )
    xis = jnp.exp(log_xi - logsumexp(log_xi, axis=(-2, -1), keepdims=True))
    return DiscreteChainResult(gammas, xis, logZ)


def parallel_forward_backward(
    log_prior: jnp.ndarray,
    log_trans: jnp.ndarray,
    log_evidence: jnp.ndarray,
) -> DiscreteChainResult:
    """Associative-scan forward-backward: O(log T) depth of K×K log-matmuls.

    Elements M_t[i,j] = log_trans_t[i,j] + log_evidence_{t+1}[i] (the linear map
    alpha_{t+1} = M_t ∘ alpha_t in the (log,+) semiring).  Because log-matmul is
    non-commutative and the recursions compose as M_t ⊙ M_{t-1} ⊙ … we scan over
    the *transposed* elements so the associative_scan's left-to-right order gives
    the transposed composite."""
    k = log_evidence.shape[-1]
    m_fwd = log_trans + log_evidence[1:][:, :, None]   # (T-1, K, K)
    n = jnp.swapaxes(m_fwd, -1, -2)                    # N_t = M_t^T

    # alphas: (M_t ⊙ … ⊙ M_0)^T = N_0 ⊙ … ⊙ N_t = prefix scan over N
    prefix = jax.lax.associative_scan(_log_matmul, n, axis=0)
    a0 = log_prior + log_evidence[0]
    alphas_rest = logsumexp(prefix + a0[:, None][None], axis=-2)
    alphas = jnp.concatenate([a0[None], alphas_rest], axis=0)

    # betas: beta_t = colsum(M_{T-2} ⊙ … ⊙ M_t).  With reverse=True the scan feeds
    # the temporally-later chunk as the LEFT operand, so the untransposed elements
    # compose in exactly this order.
    suffix = jax.lax.associative_scan(_log_matmul, m_fwd, axis=0, reverse=True)
    betas_head = logsumexp(suffix, axis=-2)            # beta_t for t = 0..T-2
    betas = jnp.concatenate([betas_head, jnp.zeros((1, k))], axis=0)

    logZ = logsumexp(alphas[-1])
    gammas = jax.nn.softmax(alphas + betas, axis=-1)
    log_xi = (
        alphas[:-1][:, None, :]
        + log_trans
        + (log_evidence[1:] + betas[1:])[:, :, None]
    )
    xis = jnp.exp(log_xi - logsumexp(log_xi, axis=(-2, -1), keepdims=True))
    return DiscreteChainResult(gammas, xis, logZ)
