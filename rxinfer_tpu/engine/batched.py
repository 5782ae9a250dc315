"""Batched-program lowering: the user-facing engine driving the fused Pallas
kernel tier.

``infer_batched`` (and ``rx.batched_program``) run B independent datasets in
ONE XLA program.  Rather than ``vmap``-ing the single-dataset program (which
cannot dispatch into ``pallas_call`` and wastes the (8, 128) tile geometry on
tiny per-chain mats), each block of the compiled plan is lowered batch-natively:

- Gaussian chain blocks whose transition/prior/evidence parameters are
  compile-time constants lower to ``ops/pallas_smoother.fused_batched_smoother``
  (VMEM-resident chain state, batch folded onto lanes).  The per-step evidence
  information vector xi is still assembled by the block's own message rules
  (vmapped XLA einsums — the data-dependent streamed payload); the constant
  evidence precision W is extracted once at plan time and numerically verified
  time-invariant.
- Discrete chain blocks always lower to ``ops/pallas_discrete.fused_fb_batched``
  (the kernel takes per-batch time-homogeneous transition tables, so VMP
  iterations with per-dataset Dirichlet posteriors stay on the kernel path);
  per-step pairwise marginals are streamed for the transition update and the
  chain pair-entropy Bethe FE.
- Every other block (plain conjugate groups, AR/GCV chains, chains with
  random/time-varying parameters) is ``vmap``-ed — correct for all models,
  fused where the workload's FLOPs are.

Reference parity: the reference has ONE entry point (src/inference/inference.jl
:577-733) and no batched execution at all; this module is what makes the same
single entry point deliver the kernel-tier throughput of BASELINE configs 1-3.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..dists import Categorical, MvNormalMeanCovariance, NormalMeanVariance
from ..graph.ir import Const, Ref
from .blocks import DiscreteChainBlock, GaussianChainBlock


def _interpret() -> bool:
    """Pallas interpret mode off-TPU (the CPU test mesh runs the same kernel
    code interpreted; on TPU the kernels compile natively)."""
    return jax.default_backend() != "tpu"


@dataclasses.dataclass(frozen=True)
class FusedGaussianPlan:
    """Compile-time constants of an eligible Gaussian chain (shared across
    batch and time — the fused kernel's closure parameters)."""

    A: np.ndarray
    b: np.ndarray
    Q: np.ndarray
    W: np.ndarray
    m0: np.ndarray
    p0: np.ndarray
    chunk: int = 8


def _plan_fused_gaussian(block: GaussianChainBlock, data0: dict):
    """Return a FusedGaussianPlan if the chain's parameters are compile-time
    constants (transition A/b/noise Const, prior Const, evidence factors with
    only Const/data neighbors), else None.

    The evidence precision W is evaluated once on the example dataset and
    verified numerically time-invariant — unary slot evidence, partial
    coverage, or missing-data masks all fail the check and fall back to the
    vmapped XLA scan path.
    """
    from ..rules.registry import get_node

    f = block.transition
    for name, v in f.interfaces.items():
        if name == "in":
            continue
        if not isinstance(v, Const):
            return None
    for v in block.prior.interfaces.values():
        if not isinstance(v, Const):
            return None
    for ef, iface in block.evidence:
        if getattr(get_node(ef.fform), "needs_self_marginal", False):
            return None  # rule reads the chain's own marginal: state-dependent
        chain_ref = ef.out if iface == "out" else ef.interfaces[iface]
        for v in ef.all_interfaces().values():
            if v is chain_ref or isinstance(v, Const):
                continue
            if isinstance(v, Ref) and v.var.kind == "data":
                continue
            return None

    length = block.var.length

    def nume(d):
        a, bb, q = block._transition_params({}, {}, length)
        m0, p0 = block._prior_moments({}, {}, None)
        _, w = block._evidence({}, d, {}, length)
        return a[0], bb[0], q[0], m0, p0, w

    try:
        d0 = {k: jnp.asarray(np.asarray(v), jnp.float32)
              for k, v in data0.items()}
        a, bb, q, m0, p0, w = jax.jit(nume)(d0)
    except Exception:  # noqa: BLE001 — any assembly failure: XLA fallback
        return None
    w = np.asarray(w)
    if w.shape[0] < 1 or not np.allclose(w, w[:1], rtol=1e-5, atol=1e-6):
        return None
    return FusedGaussianPlan(
        A=np.asarray(a, np.float32), b=np.asarray(bb, np.float32),
        Q=np.asarray(q, np.float32), W=np.asarray(w[0], np.float32),
        m0=np.asarray(m0, np.float32), p0=np.asarray(p0, np.float32),
    )


def _fused_gaussian_update(block: GaussianChainBlock, plan: FusedGaussianPlan,
                           data: dict, batch: int):
    from ..ops.pallas_smoother import fused_batched_smoother

    length = block.var.length

    def xi_of(d):
        xi, _ = block._evidence({}, d, {}, length)
        return xi

    xi_b = jax.vmap(xi_of)(data)                       # (B, T, dim)
    xi_t = jnp.moveaxis(xi_b, 0, 1)                    # (T, B, dim)
    m0 = jnp.broadcast_to(jnp.asarray(plan.m0), (batch, block.dim))
    p0 = jnp.broadcast_to(jnp.asarray(plan.p0), (batch, block.dim, block.dim))
    means, covs, cross = fused_batched_smoother(
        m0, p0, xi_t, plan.A, plan.b, plan.Q, plan.W, chunk=plan.chunk,
        interpret=_interpret(),
    )
    means_b = jnp.moveaxis(means, 0, 1)                # (B, T, dim)
    covs_b = jnp.moveaxis(covs, 0, 1)
    cross_b = jnp.moveaxis(cross, 0, 1)                # (B, T-1, d, d)
    if block.scalar:
        return (
            NormalMeanVariance(means_b[..., 0], covs_b[..., 0, 0]),
            cross_b[..., 0, 0],
        )
    # engine convention: chain_cross stores Cov(out, in) (the transpose of
    # the smoother's Cov(x_t, x_{t+1})) — see CompiledModel._sweep_once
    return (
        MvNormalMeanCovariance(means_b, covs_b),
        jnp.swapaxes(cross_b, -1, -2),
    )


def _fused_discrete_update(block: DiscreteChainBlock, state: dict, data: dict,
                           chain_cross: dict):
    from ..ops.pallas_discrete import fused_fb_batched

    lp, elog_a, log_ev = jax.vmap(block._inputs)(state, data, chain_cross)
    le_t = jnp.moveaxis(log_ev, 0, 1)                  # (T, B, K)
    g, _, _, xis = fused_fb_batched(
        lp, elog_a, le_t, chunk=32, per_step_xi=True,
        interpret=_interpret(),
    )
    marg = Categorical(jnp.log(jnp.clip(jnp.moveaxis(g, 0, 1), 1e-37)))
    return marg, jnp.moveaxis(xis, 0, 1)               # (B, T-1, K, K)


def build_plans(compiled, data0: dict, all_finite: bool = True) -> dict:
    """Decide, per chain block, whether the fused kernel tier applies.

    ``all_finite=False`` (the batch contains missing observations) disables
    the Gaussian kernel path: its evidence precision is a closure constant and
    cannot express per-slot masking.  The discrete path streams its masked
    evidence and stays fused."""
    plans: dict[str, Any] = {}
    if not getattr(compiled, "use_fused", True):
        return plans
    for kind, block in compiled.blocks:
        if kind != "chain":
            continue
        if type(block) is GaussianChainBlock and all_finite:
            plan = _plan_fused_gaussian(block, data0)
            if plan is not None:
                plans[block.var.name] = plan
        elif isinstance(block, DiscreteChainBlock):
            plans[block.var.name] = "discrete"
    return plans


def make_batched_program(compiled, data0: dict, iterations: int,
                         free_energy: bool, keep_each: bool = False,
                         all_finite: bool = True):
    """Build the pure function (batched_data) -> (state, fe, history) where
    every data leaf and every state/fe leaf carries a leading batch axis.

    Mirrors CompiledModel.make_program: first sweep eager (establishes the
    state pytree), remaining iterations under ``lax.scan``."""
    plans = build_plans(compiled, data0, all_finite=all_finite)

    def sweep(state, chain_cross, data, batch):
        for kind, block in compiled.blocks:
            name = block.var.name
            plan = plans.get(name)
            if kind == "chain" and plan is not None:
                if plan == "discrete":
                    marg, cross = _fused_discrete_update(
                        block, state, data, chain_cross)
                else:
                    marg, cross = _fused_gaussian_update(
                        block, plan, data, batch)
                state[name] = marg
                chain_cross[name] = cross
            elif kind == "chain":
                def chain_fn(st, d, cc, _b=block):
                    return _b.update(dict(st), d, cc)

                marg, cross = jax.vmap(chain_fn)(state, data, chain_cross)
                state[name] = marg
                if isinstance(block, GaussianChainBlock):
                    chain_cross[name] = (
                        cross if block.scalar
                        else jnp.swapaxes(cross, -1, -2)
                    )
                else:
                    chain_cross[name] = cross
            else:
                def plain_fn(st, d, cc, _b=block):
                    st = dict(st)
                    marg = _b.update(st, d, cc)
                    extra = {k: v for k, v in st.items()
                             if k.startswith("_msg:")}
                    return marg, extra

                marg, extra = jax.vmap(plain_fn)(state, data, chain_cross)
                state[name] = marg
                state.update(extra)
        return state, chain_cross

    def batched_fe(state, chain_cross, data):
        return jax.vmap(
            lambda st, cc, d: compiled._free_energy(st, cc, d)
        )(state, chain_cross, data)

    def program(data: dict):
        batch = jax.tree_util.tree_leaves(data)[0].shape[0]
        state0 = compiled._init_state()
        state = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a, (batch,) + jnp.shape(a)), state0
        )
        chain_cross: dict = {}
        history = []
        state, chain_cross = sweep(state, chain_cross, data, batch)
        fe0 = (
            batched_fe(state, chain_cross, data)
            if free_energy else jnp.zeros((batch,))
        )
        if keep_each:
            history.append(dict(state))
            fes = [fe0]
            for _ in range(iterations - 1):
                state, chain_cross = sweep(state, chain_cross, data, batch)
                if free_energy:
                    fes.append(batched_fe(state, chain_cross, data))
                history.append(dict(state))
            fe_arr = (jnp.stack(fes) if free_energy
                      else jnp.zeros((0, batch)))
            return state, fe_arr, history

        if iterations > 1:
            def body(carry, _):
                st, cr = carry
                st, cr = sweep(dict(st), dict(cr), data, batch)
                f = (batched_fe(st, cr, data) if free_energy
                     else jnp.zeros((batch,)))
                return (st, cr), f

            (state, chain_cross), fes_rest = jax.lax.scan(
                body, (state, chain_cross), None, length=iterations - 1
            )
            fe_arr = (
                jnp.concatenate([fe0[None], fes_rest])
                if free_energy else jnp.zeros((0, batch))
            )
        else:
            fe_arr = fe0[None] if free_energy else jnp.zeros((0, batch))
        return state, fe_arr, history

    return program
