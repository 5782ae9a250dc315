"""Streaming online filtering over many parallel chains — continuous batching.

BASELINE.json config 5: "Streaming online filtering: 10k parallel independent
LGSSM chains, continuous batching sharded across hosts."  The whole stream is a
``lax.scan`` of the batched information-form filter step; the batch axis shards
over the mesh (pure DP — zero collectives in steady state), so throughput scales
linearly with chips while each step is one fused batched 4×4-ish block op.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..dists.gaussian import pd_inverse
from ..ops.kalman import filter_step


class FilterState(NamedTuple):
    m: jnp.ndarray  # (B, d)
    p: jnp.ndarray  # (B, d, d)


def filtering_scan(state: FilterState, ys, f_mat, q_cov, h, r):
    """Scan the batched filter over a (T, B, dy) observation stream.

    The scan body runs entirely in the entry-wise representation
    (ops/entrywise.py): the carry is d + d*d separate (B,)-shaped arrays and
    every operation — including the closed-form Schur inverse — is scalar
    arithmetic on whole (B,) vectors.  XLA fuses the body into a handful of
    full-width VPU kernels; array-layout forms ((B,d,d) batched dot_generals or
    (d,d,B) einsums with stack/concat cofactor inverses) measured 100-700 us
    per step on v5e-lite for B=10k where this form is ~VPU-bound.
    d > 8 falls back to the batch-major dense path."""
    d = state.m.shape[-1]
    rinv = pd_inverse(r)
    w_obs = jnp.einsum("ji,jk,kl->il", h, rinv, h)
    hr = jnp.einsum("ji,jk->ik", h, rinv)

    if d > 8:
        def step(carry, y_t):
            m, p = carry
            xi = jnp.einsum("ik,bk->bi", hr, y_t)
            b = jnp.zeros_like(m)
            m2, p2 = filter_step(m, p, f_mat, b, q_cov, xi, w_obs)
            return FilterState(m2, p2), (m2,)

        (final, (means,)) = jax.lax.scan(step, state, ys)
        return final, means

    from ..ops import entrywise as ew

    # static (d, d) parameters as scalar entries — broadcast against (B,) carries
    f_e = [[f_mat[i, j] for j in range(d)] for i in range(d)]
    q_e = [[q_cov[i, j] for j in range(d)] for i in range(d)]
    w_e = [[w_obs[i, j] for j in range(d)] for i in range(d)]
    hr_e = [[hr[i, j] for j in range(hr.shape[1])] for i in range(d)]

    def step(carry, y_t):
        m, p = carry                       # m: d x (B,); p: d x d x (B,)
        y_e = [y_t[:, k] for k in range(y_t.shape[1])]
        xi = ew.mat_vec(hr_e, y_e)
        m_pred = ew.mat_vec(f_e, m)
        p_pred = ew.mat_sym(ew.mat_add(ew.mat_mul(ew.mat_mul(f_e, p), ew.mat_t(f_e)), q_e))
        p_pred_inv = ew.mat_sym(ew.mat_inv_scaled(p_pred))
        w_post = ew.mat_add(p_pred_inv, w_e)
        p_new = ew.mat_sym(ew.mat_inv_scaled(w_post))
        xi_tot = ew.vec_add(ew.mat_vec(p_pred_inv, m_pred), xi)
        m_new = ew.mat_vec(p_new, xi_tot)
        return (m_new, p_new), (ew.stack_vec(m_new),)

    m0 = ew.unstack_vec(state.m)                       # d entries of (B,)
    p0 = [[state.p[:, i, j] for j in range(d)] for i in range(d)]
    (mf, pf), (means,) = jax.lax.scan(step, (m0, p0), ys)
    final = FilterState(ew.stack_vec(mf),
                        jnp.stack([jnp.stack(row, axis=-1) for row in pf], axis=-2))
    return final, means


def make_sharded_filtering(mesh: Mesh, f_mat, q_cov, h, r, axis_name="batch",
                           fused=False, interpret=False, chunk=16):
    """jit the filtering scan with the batch axis sharded over the mesh.

    ``fused=True`` runs the Pallas VMEM-resident kernel
    (ops/pallas_filter.py) INSIDE each shard via shard_map — continuous
    batching sharded across chips/hosts with zero steady-state collectives
    (BASELINE config 5); pass ``interpret=True`` on the CPU test mesh."""
    if fused:
        from ..ops.pallas_filter import fused_filtering_scan

        try:
            from jax import shard_map
        except ImportError:  # pragma: no cover - older jax
            from jax.experimental.shard_map import shard_map

        def local(st, ys):
            return fused_filtering_scan(
                st, ys, f_mat, q_cov, h, r, chunk=chunk, interpret=interpret
            )

        mapped = shard_map(
            local, mesh=mesh,
            in_specs=(FilterState(P(axis_name), P(axis_name)),
                      P(None, axis_name)),
            out_specs=(FilterState(P(axis_name), P(axis_name)),
                       P(None, axis_name)),
            # pallas_call outputs carry no varying-mesh-axes metadata
            check_vma=False,
        )
        return jax.jit(mapped)

    fn = partial(filtering_scan, f_mat=f_mat, q_cov=q_cov, h=h, r=r)
    batch_sharding = NamedSharding(mesh, P(axis_name))
    state_shardings = FilterState(batch_sharding, batch_sharding)
    obs_sharding = NamedSharding(mesh, P(None, axis_name))
    return jax.jit(
        fn,
        in_shardings=(state_shardings, obs_sharding),
        out_shardings=(state_shardings, obs_sharding),
    )
