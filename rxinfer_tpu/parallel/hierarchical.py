"""Sharded hierarchical LGSSM — the flagship multi-chip training/inference step.

Model (BASELINE.json configs 1+5 hybridized, scaled out):
    B independent LGSSM chains x^b_{0:T} with SHARED unknown process-noise
    precision W ~ Wishart(nu0, S0); emissions y^b_t = H x^b_t + v, v~N(0,R).

One VMP sweep =
  (1) exact per-chain smoothing given E[W]  — local, batch-sharded (DP over
      chips, associative Kalman scans on each shard),
  (2) conjugate message to W: per-transition Wishart natural statistics
      accumulated with jnp.sum locally and ``jax.lax.psum`` across shards
      (conjugate updates are additive in natural parameters — SURVEY.md §2.3),
  (3) q(W) ← Wishart(nu0 + B(T-1), inv(S0^{-1} + C_total)) replicated on all
      shards.

This is the pattern the reference cannot express at all (no distributed
execution, SURVEY.md §2.3) and the core of the multi-chip scaling story:
compute-local smoothing overlapped with a single small collective.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..dists.gaussian import pd_inverse
from ..ops.kalman import ChainParams, parallel_smoother, sequential_smoother


class HierLGSSMState(NamedTuple):
    """Carry for the sharded VMP sweep: Wishart posterior over shared precision."""

    w_nu: jnp.ndarray   # scalar
    w_sinv: jnp.ndarray  # (d, d) inverse scale (natural form: additive)


def _chain_smooth(y, m0, p0, f_mat, h, r, q_cov):
    """Smooth one chain given process-noise covariance q_cov; returns
    (means, covs, cross) — vmapped over the local batch."""
    t = y.shape[0]
    d = m0.shape[0]
    rinv = pd_inverse(r)
    w_obs = jnp.einsum("ji,jk,kl->il", h, rinv, h)
    xi = jnp.einsum("ji,jk,tk->ti", h, rinv, y)
    params = ChainParams(
        m0,
        p0,
        jnp.broadcast_to(f_mat, (t - 1, d, d)),
        jnp.zeros((t - 1, d)),
        jnp.broadcast_to(q_cov, (t - 1, d, d)),
        xi,
        jnp.broadcast_to(w_obs, (t, d, d)),
    )
    res = parallel_smoother(params)
    return res.means, res.covs, res.cross


def _transition_suffstats(means, covs, cross, f_mat):
    """Σ_t E[(x_{t+1} - F x_t)(x_{t+1} - F x_t)^T] under the smoothed posterior."""
    m_in, m_out = means[:-1], means[1:]
    v_in, v_out = covs[:-1], covs[1:]
    diff = m_out - jnp.einsum("ij,tj->ti", f_mat, m_in)
    c = (
        v_out
        + jnp.einsum("ij,tjk,lk->til", f_mat, v_in, f_mat)
        + diff[:, :, None] * diff[:, None, :]
    )
    # cross term: -F Cov(x_t, x_{t+1}) - (F Cov)^T ; cross = Cov(x_t, x_{t+1})
    fc = jnp.einsum("ij,tjk->tik", f_mat, cross)
    c = c - jnp.swapaxes(fc, -1, -2) - fc
    return jnp.sum(c, axis=0)


def hier_lgssm_sweep(state: HierLGSSMState, y_local, m0, p0, f_mat, h, r,
                     nu0, s0_inv, axis_name="batch"):
    """One sharded VMP sweep (runs inside shard_map).  y_local: (B_local, T, dy).

    ``axis_name`` may be a tuple like ("host", "batch"): the conjugate psum
    then reduces hierarchically over ICI within each host and once over the
    DCN host axis (XLA lowers the tuple-axis psum that way automatically)."""
    d = m0.shape[0]
    e_w = state.w_nu * pd_inverse(state.w_sinv)   # E[W] = nu * S, S = Sinv^{-1}
    q_cov = pd_inverse(e_w)

    means, covs, cross = jax.vmap(
        lambda yb: _chain_smooth(yb, m0, p0, f_mat, h, r, q_cov)
    )(y_local)

    c_local = jnp.sum(
        jax.vmap(lambda m, c, x: _transition_suffstats(m, c, x, f_mat))(
            means, covs, cross
        ),
        axis=0,
    )
    n_local = jnp.asarray(y_local.shape[0] * (y_local.shape[1] - 1), jnp.float32)

    # THE collective: conjugate natural-parameter accumulation across shards.
    c_total = jax.lax.psum(c_local, axis_name)
    n_total = jax.lax.psum(n_local, axis_name)

    new_state = HierLGSSMState(nu0 + n_total, s0_inv + c_total)
    return new_state, (means, covs)


def make_sharded_step(mesh: Mesh, m0, p0, f_mat, h, r, nu0, s0_inv,
                      axis_name="batch"):
    """Build the jitted multi-chip step: (state, y_global) -> (state', marginals).

    y_global is sharded over ``axis_name`` (a name or tuple of names — pass
    ("host", "batch") with a hybrid DCN×ICI mesh); the Wishart state is
    replicated."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    sweep = partial(
        hier_lgssm_sweep, m0=m0, p0=p0, f_mat=f_mat, h=h, r=r,
        nu0=nu0, s0_inv=s0_inv, axis_name=axis_name,
    )

    mapped = shard_map(
        lambda st, y: sweep(st, y),
        mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=(P(), P(axis_name)),
    )
    return jax.jit(mapped)
