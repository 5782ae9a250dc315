"""Pallas fused batched discrete forward-backward (HMM inner solver).

BASELINE config 3 is structured mean-field VMP on an HMM; the inner solver is
exact alpha-beta over a categorical chain given expected log-potentials
(ops/discrete_chain.py).  Batched over B independent chains the lax.scan /
associative-scan paths round-trip the (B, K) carry through HBM every step;
this kernel keeps the carry in VMEM (same machine shape as
ops/pallas_filter.py / pallas_smoother.py):

- forward kernel: streams log-evidence blocks in, writes max-normalized
  alphas out, carries (alpha, cumulative normalizer) in pinned VMEM outputs;
- backward kernel: streams evidence + alphas REVERSED, emits singleton
  marginals gamma_t per step and accumulates the summed pairwise marginals
  Σ_t xi_t — the sufficient statistic of the Dirichlet transition update —
  in VMEM (per-step pairwise tables never touch HBM).

Layout: batch folded onto (S, L=128) fp32 tiles; K (the state count) is a
static unrolled dimension; the per-chain transition table E[log A] (B, K, K)
is time-homogeneous and VMEM-pinned.

Normalization notes: alphas and betas are max-normalized per step (gammas and
xis are shift-invariant; the forward normalizers accumulate into logZ).
Convention matches discrete_chain.py: trans[i, j] = potential of s_{t+1}=i
given s_t=j; xi_t[i, j] = q(s_{t+1}=i, s_t=j).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_filter import _fold_batch, _unfold_batch, batch_pad


def _lse(terms):
    """logsumexp of a python list of (S, L) arrays, max-normalized."""
    m = terms[0]
    for t in terms[1:]:
        m = jnp.maximum(m, t)
    s = sum(jnp.exp(t - m) for t in terms)
    return m + jnp.log(s)


def _fb_fwd_kernel(lp_ref, lt_ref, le_ref, alpha_ref, acarry_ref, cum_ref,
                   *, k, chunk, t_total):
    @pl.when(pl.program_id(0) == 0)
    def _():
        for i in range(k):
            acarry_ref[i] = lp_ref[i]
        cum_ref[0] = jnp.zeros_like(cum_ref[0])

    lt = [[lt_ref[i * k + j] for j in range(k)] for i in range(k)]
    base_t = pl.program_id(0) * chunk

    def body(t, carry):
        alpha, cum = carry
        le = [le_ref[t, i] for i in range(k)]
        first = base_t + t == 0
        # step 0: alpha_0 = prior + evidence (acarry holds the prior)
        trans = [_lse([lt[i][j] + alpha[j] for j in range(k)])
                 for i in range(k)]
        a_new = [jnp.where(first, alpha[i], trans[i]) + le[i]
                 for i in range(k)]
        m = a_new[0]
        for i in range(1, k):
            m = jnp.maximum(m, a_new[i])
        a_new = [a - m for a in a_new]
        cum_new = cum + m
        live = base_t + t < t_total
        a_new = [jnp.where(live, a, b) for a, b in zip(a_new, alpha)]
        cum_new = jnp.where(live, cum_new, cum)
        for i in range(k):
            alpha_ref[t, i] = a_new[i]
        return a_new, cum_new

    a0 = [acarry_ref[i] for i in range(k)]
    a_fin, cum_fin = jax.lax.fori_loop(0, chunk, body, (a0, cum_ref[0]))
    for i in range(k):
        acarry_ref[i] = a_fin[i]
    cum_ref[0] = cum_fin


def _fb_bwd_kernel(lt_ref, le_ref, alpha_ref, gamma_ref, beta_ref,
                   lenext_ref, xi_ref, *xisteps_ref, k, chunk, t_total, t_pad):
    # xisteps_ref: optional trailing output streaming the PER-STEP pairwise
    # marginals xi_t (chunk, K*K, S, L) — the reference's structured chain
    # pair marginals (needed for chain pair-entropy FE and per-step
    # transition statistics inside the fused path; reference structured FE
    # src/model/plugins/reactivemp_free_energy.jl:57-63).
    xisteps_ref = xisteps_ref[0] if xisteps_ref else None

    @pl.when(pl.program_id(0) == 0)
    def _():
        for i in range(k):
            beta_ref[i] = jnp.zeros_like(beta_ref[i])
            lenext_ref[i] = jnp.zeros_like(lenext_ref[i])
        for n in range(k * k):
            xi_ref[n] = jnp.zeros_like(xi_ref[n])

    lt = [[lt_ref[i * k + j] for j in range(k)] for i in range(k)]
    base = t_pad - (pl.program_id(0) + 1) * chunk

    def body(tl, carry):
        t = chunk - 1 - tl
        rt = base + t
        beta, le_next, xi = carry
        alpha = [alpha_ref[t, i] for i in range(k)]
        le_t = [le_ref[t, i] for i in range(k)]

        is_last = rt == t_total - 1
        dead = rt >= t_total

        # s[i][j] = trans[i,j] + le_{t+1}[i] + beta_{t+1}[i]
        s = [[lt[i][j] + le_next[i] + beta[i] for j in range(k)]
             for i in range(k)]
        b_raw = [_lse([s[i][j] for i in range(k)]) for j in range(k)]
        mb = b_raw[0]
        for j in range(1, k):
            mb = jnp.maximum(mb, b_raw[j])
        b_new = [jnp.where(is_last, 0.0, b - mb) for b in b_raw]

        # gamma_t = softmax(alpha_t + beta_t)
        g_log = [alpha[i] + b_new[i] for i in range(k)]
        mg = g_log[0]
        for i in range(1, k):
            mg = jnp.maximum(mg, g_log[i])
        g_exp = [jnp.exp(g - mg) for g in g_log]
        g_sum = sum(g_exp)
        for i in range(k):
            gamma_ref[t, i] = g_exp[i] / g_sum

        # xi_t[i,j] = softmax_ij(alpha_t[j] + s[i][j]) — only for t < T-1
        x_log = [[alpha[j] + s[i][j] for j in range(k)] for i in range(k)]
        mx = x_log[0][0]
        for i in range(k):
            for j in range(k):
                mx = jnp.maximum(mx, x_log[i][j])
        x_exp = [[jnp.exp(x_log[i][j] - mx) for j in range(k)]
                 for i in range(k)]
        x_sum = sum(sum(row) for row in x_exp)
        use_xi = jnp.logical_and(jnp.logical_not(is_last),
                                 jnp.logical_not(dead))
        xi_t = [jnp.where(use_xi, x_exp[i][j] / x_sum, 0.0)
                for i in range(k) for j in range(k)]
        xi_new = [xi[i * k + j] + xi_t[i * k + j]
                  for i in range(k) for j in range(k)]
        if xisteps_ref is not None:
            for n in range(k * k):
                xisteps_ref[t, n] = xi_t[n]

        beta_out = [jnp.where(dead, b0_, b1_) for b0_, b1_ in zip(beta, b_new)]
        le_out = [jnp.where(dead, a, b) for a, b in zip(le_next, le_t)]
        return beta_out, le_out, xi_new

    beta0 = [beta_ref[i] for i in range(k)]
    le0 = [lenext_ref[i] for i in range(k)]
    xi0 = [xi_ref[n] for n in range(k * k)]
    beta_f, le_f, xi_f = jax.lax.fori_loop(0, chunk, body, (beta0, le0, xi0))
    for i in range(k):
        beta_ref[i] = beta_f[i]
        lenext_ref[i] = le_f[i]
    for n in range(k * k):
        xi_ref[n] = xi_f[n]


@partial(jax.jit, static_argnames=("chunk", "interpret", "per_step_xi"))
def fused_fb_soa(log_prior, log_trans, log_evidence, *, chunk=32,
                 interpret=False, per_step_xi=False):
    """SoA fused forward-backward.  log_prior (K,S,L); log_trans (K*K,S,L)
    row-major [i*K+j] = [out, in]; log_evidence (T,K,S,L).
    Returns gammas (T,K,S,L), xi_sum (K*K,S,L), logZ (S,L); with
    ``per_step_xi=True`` additionally streams the per-step pairwise marginals
    xi_steps (T,K*K,S,L) to HBM (xi_steps[T-1] is zero — there is no
    transition out of the final step)."""
    k = log_prior.shape[0]
    s, l = log_prior.shape[1], log_prior.shape[2]
    t_total = log_evidence.shape[0]
    t_pad = -(-t_total // chunk) * chunk
    if t_pad != t_total:
        log_evidence = jnp.pad(
            log_evidence, ((0, t_pad - t_total), (0, 0), (0, 0), (0, 0)))

    grid = (t_pad // chunk,)
    full3 = lambda n: pl.BlockSpec((n, s, l), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM)
    stream = lambda n: pl.BlockSpec((chunk, n, s, l), lambda i: (i, 0, 0, 0),
                                    memory_space=pltpu.VMEM)
    rstream = lambda n: pl.BlockSpec(
        (chunk, n, s, l), lambda i: (t_pad // chunk - 1 - i, 0, 0, 0),
        memory_space=pltpu.VMEM)

    fwd = partial(_fb_fwd_kernel, k=k, chunk=chunk, t_total=t_total)
    alphas, a_fin, cum = pl.pallas_call(
        fwd,
        grid=grid,
        in_specs=[full3(k), full3(k * k), stream(k)],
        out_specs=(stream(k), full3(k), full3(1)),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, k, s, l), jnp.float32),
            jax.ShapeDtypeStruct((k, s, l), jnp.float32),
            jax.ShapeDtypeStruct((1, s, l), jnp.float32),
        ),
        interpret=interpret,
    )(log_prior, log_trans, log_evidence)

    bwd = partial(_fb_bwd_kernel, k=k, chunk=chunk, t_total=t_total,
                  t_pad=t_pad)
    out_specs = [rstream(k), full3(k), full3(k), full3(k * k)]
    out_shape = [
        jax.ShapeDtypeStruct((t_pad, k, s, l), jnp.float32),
        jax.ShapeDtypeStruct((k, s, l), jnp.float32),
        jax.ShapeDtypeStruct((k, s, l), jnp.float32),
        jax.ShapeDtypeStruct((k * k, s, l), jnp.float32),
    ]
    if per_step_xi:
        out_specs.append(rstream(k * k))
        out_shape.append(
            jax.ShapeDtypeStruct((t_pad, k * k, s, l), jnp.float32))
    outs = pl.pallas_call(
        bwd,
        grid=grid,
        in_specs=[full3(k * k), rstream(k), rstream(k)],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(log_trans, log_evidence, alphas)
    gammas, xi_sum = outs[0], outs[3]

    m = jnp.max(a_fin, axis=0)
    logz = cum[0] + m + jnp.log(jnp.sum(jnp.exp(a_fin - m), axis=0))
    if per_step_xi:
        return gammas[:t_total], xi_sum, logz, outs[4][:t_total]
    return gammas[:t_total], xi_sum, logz


def fused_fb_batched(log_prior, log_trans, log_evidence, *, chunk=32,
                     interpret=False, per_step_xi=False):
    """Batch-axis wrapper.  log_prior (B,K); log_trans (B,K,K) [out,in];
    log_evidence (T,B,K).  Returns gammas (T,B,K), xi_sum (B,K,K), logZ (B,);
    with ``per_step_xi=True`` also xi_steps (T-1,B,K,K)."""
    b_n, k = log_prior.shape
    b_pad = batch_pad(b_n)
    lp = _fold_batch(log_prior.astype(jnp.float32), b_pad)
    lt = _fold_batch(
        log_trans.reshape(b_n, k * k).astype(jnp.float32), b_pad)
    le = jnp.moveaxis(
        _fold_batch(jnp.moveaxis(log_evidence.astype(jnp.float32), 0, -1),
                    b_pad), 1, 0)
    outs = fused_fb_soa(lp, lt, le, chunk=chunk, interpret=interpret,
                        per_step_xi=per_step_xi)
    gammas, xi_sum, logz = outs[:3]
    g = jnp.moveaxis(_unfold_batch(jnp.moveaxis(gammas, 0, 1), b_n), -1, 0)
    xi = _unfold_batch(xi_sum, b_n).reshape(b_n, k, k)
    lz = _unfold_batch(logz[None], b_n)[:, 0]
    if per_step_xi:
        t_total = log_evidence.shape[0]
        xs = _unfold_batch(jnp.moveaxis(outs[3], 0, 1), b_n)  # (B, K*K, T)
        xs = jnp.moveaxis(xs, -1, 0).reshape(t_total, b_n, k, k)
        return g, xi, lz, xs[: t_total - 1] if t_total > 1 else xs[:0]
    return g, xi, lz
