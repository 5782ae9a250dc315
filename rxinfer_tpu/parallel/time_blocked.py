"""Time-blocked distributed Kalman smoothing — exact parallel smoothing of ONE
long chain sharded over the TIME axis of a device mesh.

BASELINE.json mandate: "time-blocked chains of long SSMs … boundary-message
exchange between neighbor shards … or solved via parallel prefix (associative
scan) over Gaussian message operators."  This module implements the parallel-
prefix form as a *manual distributed associative scan*:

  1. each shard runs the local associative scan over its T/P filter elements,
  2. the per-shard composite elements (5 small matrices) are all-gathered —
     the ONLY collective, O(P·d²) bytes over ICI,
  3. each shard composes the exclusive prefix of earlier blocks' composites and
     applies it to its local results (pure local compute),
  4. the backward (smoothing) pass mirrors this with suffix composites.

Exactness: identical algebra to ops/kalman.parallel_smoother, just blocked —
results match the single-device smoother to float tolerance (tested on the
8-device CPU mesh).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.kalman import (
    ChainParams,
    _filter_compose,
    _smooth_compose,
)
from ..dists.gaussian import _symmetrize, pd_inverse
from ..ops.smallmat import small_inv, small_solve


def _filter_identity(d: int, dtype=jnp.float32):
    eye = jnp.eye(d, dtype=dtype)
    zv = jnp.zeros((d,), dtype)
    zm = jnp.zeros((d, d), dtype)
    return (eye, zv, zm, zv, zm)


def _smooth_identity(d: int, dtype=jnp.float32):
    eye = jnp.eye(d, dtype=dtype)
    return (eye, jnp.zeros((d,), dtype), jnp.zeros((d, d), dtype))


def _make_elements_uniform(f_full, b_full, q_full, xi, w):
    """Per-step filter elements for t >= 1 (vectorized); index 0 produces a
    garbage element that the first shard overwrites with the prior element."""
    d = xi.shape[-1]
    eye = jnp.eye(d, dtype=xi.dtype)

    def make(f, b, q, xi_t, w_t):
        # (I + W Q) = (I + Q W)^T for symmetric Q, W: one closed-form inverse
        # (ops/smallmat.py — TPU-fast; batched LU lowers to per-matrix loops)
        minv = small_inv(eye + q @ w_t)
        a = minv @ f
        belem = minv @ (b + q @ xi_t)
        c = minv @ q
        minv_t = minv.T
        eta = f.T @ (minv_t @ (xi_t - w_t @ b))
        j = f.T @ (minv_t @ w_t) @ f
        return a, belem, _symmetrize(c), eta, _symmetrize(j)

    return jax.vmap(make)(f_full, b_full, q_full, xi, w)


def _tree_at0(tree, values):
    return tuple(a.at[0].set(v) for a, v in zip(tree, values))


def _tree_last(tree):
    return tuple(a[-1] for a in tree)


def _tree_dyn(tree, idx):
    return tuple(jax.lax.dynamic_index_in_dim(a, idx, 0, keepdims=False) for a in tree)


def _tree_where(pred, a, b):
    return tuple(jnp.where(pred, x, y) for x, y in zip(a, b))


def _block_smoother(m0, p0, f_full, b_full, q_full, f_shift, b_shift, q_shift,
                    xi, w, axis_name: str):
    """Runs inside shard_map; array args carry the LOCAL time block."""
    d = m0.shape[-1]
    p_idx = jax.lax.axis_index(axis_name)
    n_shards = jax.lax.axis_size(axis_name)
    blk = xi.shape[0]

    # ---- forward (filtering) ----
    elems = _make_elements_uniform(f_full, b_full, q_full, xi, w)
    # shard 0, slot 0: exact filtered prior element
    w_post0 = pd_inverse(p0) + w[0]
    c0 = pd_inverse(w_post0)
    m0f = c0 @ (small_solve(p0, m0, matrix=False) + xi[0])
    prior_elem = (jnp.zeros((d, d)), m0f, c0, jnp.zeros((d,)), jnp.zeros((d, d)))
    slot0 = _tree_where(p_idx == 0,
                        prior_elem,
                        tuple(a[0] for a in elems))
    elems = _tree_at0(elems, slot0)

    local = jax.lax.associative_scan(jax.vmap(_filter_compose), elems, axis=0)
    total = _tree_last(local)
    totals = jax.lax.all_gather(total, axis_name)           # (P, ...)
    prefix = jax.lax.associative_scan(jax.vmap(_filter_compose), totals, axis=0)
    ident_f = _filter_identity(d)
    off_idx = jnp.maximum(p_idx - 1, 0)
    offset = _tree_where(p_idx == 0, ident_f, _tree_dyn(prefix, off_idx))
    composed = jax.vmap(lambda e: _filter_compose(offset, e))(local)
    _, filt_means, filt_covs, _, _ = composed

    # ---- backward (smoothing) ----
    def make_s(mf, cf, f, b, q):
        p_pred = _symmetrize(f @ cf @ f.T + q)
        e = small_solve(p_pred, f @ cf, matrix=True).T
        g = mf - e @ (f @ mf + b)
        l = _symmetrize(cf - e @ p_pred @ e.T)
        return e, g, l

    s_elems = jax.vmap(make_s)(filt_means, filt_covs, f_shift, b_shift, q_shift)
    # last global element: (0, m_f, P_f)
    last_elem = (jnp.zeros((d, d)), filt_means[-1], filt_covs[-1])
    is_last_shard = p_idx == n_shards - 1
    slot_last = _tree_where(is_last_shard, last_elem, tuple(a[-1] for a in s_elems))
    s_elems = tuple(a.at[-1].set(v) for a, v in zip(s_elems, slot_last))

    local_s = jax.lax.associative_scan(
        jax.vmap(_smooth_compose), s_elems, axis=0, reverse=True
    )
    total_s = tuple(a[0] for a in local_s)
    totals_s = jax.lax.all_gather(total_s, axis_name)
    suffix = jax.lax.associative_scan(
        jax.vmap(_smooth_compose), totals_s, axis=0, reverse=True
    )
    ident_s = _smooth_identity(d)
    off_idx_s = jnp.minimum(p_idx + 1, n_shards - 1)
    offset_s = _tree_where(is_last_shard, ident_s, _tree_dyn(suffix, off_idx_s))
    composed_s = jax.vmap(lambda e: _smooth_compose(offset_s, e))(local_s)
    _, means, covs = composed_s

    e_step = s_elems[0]
    return means, covs, filt_means, filt_covs, e_step


def time_blocked_smooth(mesh: Mesh, axis_name: str,
                        m0, p0, f, b, q, xi, w):
    """Distributed smoothing of ONE chain, callable from inside a larger
    traced program (rx.infer's time-sharded chain path routes here).

    ``f, b, q``: (T-1, ...) global transition params; ``xi, w``: (T, ...)
    information-form evidence.  T must be divisible by the mesh's
    ``axis_name`` size.  Returns (means, covs, filt_means, filt_covs, cross)
    with ``cross[t] = Cov(x_t, x_{t+1})`` — the same conventions as
    ops/kalman.parallel_smoother."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    d = m0.shape[-1]
    t_spec = P(axis_name)
    rep = P()
    mapped = shard_map(
        partial(_block_smoother, axis_name=axis_name),
        mesh=mesh,
        in_specs=(rep, rep, t_spec, t_spec, t_spec, t_spec, t_spec, t_spec,
                  t_spec, t_spec),
        out_specs=(t_spec, t_spec, t_spec, t_spec, t_spec),
    )
    eye = jnp.eye(d, dtype=xi.dtype)
    f_full = jnp.concatenate([eye[None], f], axis=0)
    b_full = jnp.concatenate([jnp.zeros((1, d), xi.dtype), b], axis=0)
    q_full = jnp.concatenate([eye[None], q], axis=0)
    f_shift = jnp.concatenate([f, eye[None]], axis=0)
    b_shift = jnp.concatenate([b, jnp.zeros((1, d), xi.dtype)], axis=0)
    q_shift = jnp.concatenate([q, eye[None]], axis=0)
    means, covs, fm, fc, e_step = mapped(
        m0, p0, f_full, b_full, q_full, f_shift, b_shift, q_shift, xi, w
    )
    # pairwise cross covariances: E_t @ P_{t+1|T}; the (sharded) roll is a
    # boundary halo exchange inserted by GSPMD.
    covs_next = jnp.roll(covs, -1, axis=0)
    cross = jnp.einsum("tij,tjk->tik", e_step, covs_next)[:-1]
    return means, covs, fm, fc, cross


def make_time_blocked_smoother(mesh: Mesh, d: int, axis_name: str = "time"):
    """Build the jitted distributed smoother.

    Input ChainParams must have the uniform layout: F/b/Q of length T (index 0
    unused), evidence xi/W of length T; leading axis sharded over ``axis_name``.
    Returns (means, covs, filt_means, filt_covs, cross)."""

    def smoother(m0, p0, f, b, q, xi, w):
        return time_blocked_smooth(mesh, axis_name, m0, p0, f, b, q, xi, w)

    return jax.jit(smoother)
