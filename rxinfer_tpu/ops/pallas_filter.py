"""Pallas fused VMEM-resident streaming filter kernel.

The ``lax.scan`` streaming filter (parallel/filtering.py) round-trips its
(B, d) + (B, d, d) carry through HBM every step and re-launches the fused VPU
body per step; at B=10k, d=4 that measures ~20 us/step on v5e-lite while the
actual traffic that *must* move — the observation slice in, the posterior mean
out — is ~320 KB/step (~0.4 us at HBM speed-of-light).  This kernel closes the
gap by keeping the filter state resident in VMEM for the whole stream:

- grid = sequential chunks of the time axis; the Pallas pipeline double-buffers
  the SoA observation blocks (chunk, dy, S, L) HBM->VMEM and the posterior-mean
  blocks back, overlapping DMA with the VPU filter math;
- the running state (d + d*d entries of shape (S, L)) lives in the final-state
  *output* refs, whose constant index_map pins them in VMEM across grid steps
  (the standard revisited-block accumulator pattern) — zero HBM traffic for
  the carry;
- the per-step math is the same entry-wise information-form step as the scan
  path (ops/entrywise.py): straight-line scalar arithmetic on (S, L) tiles,
  including the closed-form Schur inverse, so everything is full-width VPU.

Layout: the batch axis is folded onto full (sublane=S, lane=L=128) tiles, so a
(B,) carry entry is one dense (S, 128) fp32 tile array — no padding waste past
ceil(B/1024)*1024.

Reference parity note: the reference has no analogue — its streaming engine
processes one observation at a time on one CPU thread
(src/inference/streaming.jl:311-436); this is the TPU-native replacement for
BASELINE config 5 (10k parallel chains, continuous batching).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import entrywise as ew

LANE = 128
SUBLANE = 8


def _read_smem_mat(ref, n, m):
    return [[ref[i, j] for j in range(m)] for i in range(n)]


# -- symmetric (upper-triangle) batch folding, shared with pallas_smoother ----

def sym_idx(d):
    return [(i, j) for i in range(d) for j in range(i, d)]


def sym_fold(p, b_pad):
    """(B, d, d) symmetric -> (nsym, S, L) upper-tri SoA."""
    d = p.shape[-1]
    cols = [p[:, i, j] for (i, j) in sym_idx(d)]
    return _fold_batch(jnp.stack(cols, axis=-1), b_pad).reshape(
        (len(cols), b_pad // LANE, LANE))


def sym_unfold(x, b, d):
    """(nsym, S, L) -> (B, d, d)."""
    flat = _unfold_batch(x, b)                           # (B, nsym)
    out = jnp.zeros((b, d, d), flat.dtype)
    for k, (i, j) in enumerate(sym_idx(d)):
        out = out.at[:, i, j].set(flat[:, k])
        out = out.at[:, j, i].set(flat[:, k])
    return out


def sym_unfold_t(x, b, d):
    """(T, nsym, S, L) -> (T, B, d, d)."""
    flat = _unfold_batch(jnp.moveaxis(x, 0, 1), b)       # (B, nsym, T)
    out = jnp.zeros((b, d, d, flat.shape[-1]), flat.dtype)
    for k, (i, j) in enumerate(sym_idx(d)):
        out = out.at[:, i, j].set(flat[:, k])
        out = out.at[:, j, i].set(flat[:, k])
    return jnp.moveaxis(out, -1, 0)


def _filter_kernel(f_s, q_s, w_s, hr_s, m0_ref, p0_ref, ys_ref,
                   means_ref, mf_ref, pf_ref, *, d, dy, chunk, t_total):
    """One grid step = ``chunk`` filter steps on the VMEM-resident state.

    Covariance carried as the d(d+1)/2 upper-triangle entries; all
    symmetric products/inverses compute upper-triangle only
    (ops/entrywise.py sym_* — ~30% fewer VPU ops than the full-matrix
    formulation on this VPU-bound kernel)."""
    nsym = d * (d + 1) // 2
    sidx = sym_idx(d)

    @pl.when(pl.program_id(0) == 0)
    def _():
        mf_ref[...] = m0_ref[...]
        pf_ref[...] = p0_ref[...]

    f_e = _read_smem_mat(f_s, d, d)
    q_e = _read_smem_mat(q_s, d, d)
    w_e = _read_smem_mat(w_s, d, d)
    hr_e = _read_smem_mat(hr_s, d, dy)

    base_t = pl.program_id(0) * chunk

    def _unpack(entries):
        m = [[None] * d for _ in range(d)]
        for e, (i, j) in zip(entries, sidx):
            m[i][j] = e
            m[j][i] = e
        return m

    def body(t, carry):
        m, p_entries = carry
        p = _unpack(p_entries)
        y_e = [ys_ref[t, k] for k in range(dy)]
        xi = ew.mat_vec(hr_e, y_e)
        m_pred = ew.mat_vec(f_e, m)
        p_pred = ew.sandwich_sym(f_e, p, q_e)
        p_pred_inv = ew.sym_inv_scaled(p_pred)
        w_post = ew.sym_alias([
            [p_pred_inv[i][j] + w_e[i][j] if i <= j else None
             for j in range(d)] for i in range(d)])
        p_new = ew.sym_inv_scaled(w_post)
        xi_tot = ew.vec_add(ew.mat_vec(p_pred_inv, m_pred), xi)
        m_new = ew.mat_vec(p_new, xi_tot)

        # time padding: steps past t_total must not advance the state
        live = base_t + t < t_total
        m_new = [jnp.where(live, a, b) for a, b in zip(m_new, m)]
        p_new_entries = [jnp.where(live, p_new[i][j], e)
                         for e, (i, j) in zip(p_entries, sidx)]
        for i in range(d):
            means_ref[t, i] = m_new[i]
        return m_new, p_new_entries

    m0 = [mf_ref[i] for i in range(d)]
    p0 = [pf_ref[k] for k in range(nsym)]
    mf, pf = jax.lax.fori_loop(0, chunk, body, (m0, p0))
    for i in range(d):
        mf_ref[i] = mf[i]
    for k in range(nsym):
        pf_ref[k] = pf[k]


@partial(jax.jit, static_argnames=("chunk", "interpret"))
def fused_filter_soa(m0, p0, ys, f_mat, q_cov, hr, w_obs, *,
                     chunk=16, interpret=False):
    """VMEM-resident streaming filter on SoA inputs.

    Args:
      m0:  (d, S, L)    initial means, batch folded onto (S, L) tiles
      p0:  (nsym, S, L) initial covariances, upper-triangle entries
                        (nsym = d(d+1)/2; see sym_fold)
      ys:  (T, dy, S, L) observation stream, SoA
      f_mat, q_cov: (d, d); hr = H^T R^-1 (d, dy); w_obs = H^T R^-1 H (d, d)
    Returns:
      means (T, d, S, L), final (m, p) in the same SoA layout (p packed).
    """
    d = m0.shape[0]
    nsym = d * (d + 1) // 2
    dy = ys.shape[1]
    t_total = ys.shape[0]
    s, l = m0.shape[1], m0.shape[2]
    t_pad = -(-t_total // chunk) * chunk
    if t_pad != t_total:
        ys = jnp.pad(ys, ((0, t_pad - t_total), (0, 0), (0, 0), (0, 0)))

    grid = (t_pad // chunk,)
    smem = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM)
    full3 = lambda n: pl.BlockSpec((n, s, l), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM)
    stream4 = lambda n: pl.BlockSpec((chunk, n, s, l),
                                     lambda i: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM)

    kernel = partial(_filter_kernel, d=d, dy=dy, chunk=chunk, t_total=t_total)
    means, mf, pf = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem(d, d), smem(d, d), smem(d, d), smem(d, dy),
                  full3(d), full3(nsym), stream4(dy)],
        out_specs=(stream4(d), full3(d), full3(nsym)),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, d, s, l), jnp.float32),
            jax.ShapeDtypeStruct((d, s, l), jnp.float32),
            jax.ShapeDtypeStruct((nsym, s, l), jnp.float32),
        ),
        interpret=interpret,
    )(f_mat, q_cov, w_obs, hr, m0, p0, ys)
    return means[:t_total], mf, pf


def _fold_batch(x, b_pad):
    """(B, ...) -> (..., S, L) with the batch axis folded onto tiles."""
    b = x.shape[0]
    pad = [(0, b_pad - b)] + [(0, 0)] * (x.ndim - 1)
    x = jnp.pad(x, pad)
    x = jnp.moveaxis(x, 0, -1)  # (..., B_pad)
    return x.reshape(x.shape[:-1] + (b_pad // LANE, LANE))


def _unfold_batch(x, b):
    """(..., S, L) -> (B, ...)."""
    x = x.reshape(x.shape[:-2] + (-1,))
    return jnp.moveaxis(x, -1, 0)[:b]


def batch_pad(b):
    return -(-b // (SUBLANE * LANE)) * (SUBLANE * LANE)


def fused_filtering_scan(state, ys, f_mat, q_cov, h, r, *,
                         chunk=16, interpret=False):
    """Drop-in fused equivalent of parallel.filtering.filtering_scan.

    Takes (B, d) / (B, d, d) state and (T, B, dy) observations, handles the
    SoA fold/unfold (two extra XLA transpose passes; streaming producers that
    can stage observations SoA should call fused_filter_soa directly).
    """
    from ..dists.gaussian import pd_inverse
    from ..parallel.filtering import FilterState

    b, d = state.m.shape
    t_total = ys.shape[0]
    b_pad = batch_pad(b)

    rinv = pd_inverse(r)
    w_obs = jnp.einsum("ji,jk,kl->il", h, rinv, h).astype(jnp.float32)
    hr = jnp.einsum("ji,jk->ik", h, rinv).astype(jnp.float32)

    m0 = _fold_batch(state.m.astype(jnp.float32), b_pad)          # (d, S, L)
    p0 = sym_fold(state.p.astype(jnp.float32), b_pad)             # (nsym, S, L)
    # pad chains get identity covariance so the Schur inverse stays finite
    if b_pad != b:
        eye = sym_fold(
            jnp.broadcast_to(jnp.eye(d, dtype=jnp.float32), (b_pad, d, d)),
            b_pad,
        )
        mask = _fold_batch(
            jnp.arange(b_pad) < b, b_pad
        )  # (S, L) bool
        p0 = jnp.where(mask, p0, eye)

    ys_soa = _fold_batch(
        jnp.moveaxis(ys.astype(jnp.float32), 0, -1), b_pad
    )  # (dy, T, S, L) -> want (T, dy, S, L)
    ys_soa = jnp.moveaxis(ys_soa, 1, 0)

    means, mf, pf = fused_filter_soa(
        m0, p0, ys_soa, f_mat.astype(jnp.float32), q_cov.astype(jnp.float32),
        hr, w_obs, chunk=chunk, interpret=interpret,
    )
    mean_out = _unfold_batch(jnp.moveaxis(means, 0, 1), b)        # (B, T, d)?
    # means: (T, d, S, L) -> moveaxis(0,1) gives (d, T, S, L); unfold -> (B, d, T)
    mean_out = jnp.moveaxis(mean_out, -1, 0)                      # (T, B, d)
    final = FilterState(
        _unfold_batch(mf, b),
        sym_unfold(pf, b, d),
    )
    return final, mean_out
