"""Bethe free-energy assembly (reference: ReactiveMPFreeEnergyPlugin + score(),
src/model/plugins/reactivemp_free_energy.jl).

FE = Σ_a E_{q_a}[-log f_a]  -  Σ_a H[q_a]  +  Σ_i (d_i - 1) H[q_i]

  * q_a is the factor's local joint: the structured pairwise marginal for chain
    transition factors (Gaussian cross-covariance / discrete xi), mean-field
    product otherwise.
  * Observed/constant interfaces are PointMass: their (infinite) entropies cancel
    exactly per CountingReal semantics — here they are *omitted symbolically at
    compile time* (dists.base.CountingReal documents the accounting), so the XLA
    program only sums finite terms.
  * On a tree at the BP fixed point this equals -log Z, which the test-suite
    cross-checks against the Kalman prediction-error log-evidence.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..dists import PointMass
from ..dists.gaussian import pd_logdet
from ..graph.ir import Const, Factor, ModelGraph, Ref, SymIndex
from ..rules.registry import get_average_energy
from .blocks import _coverage, build_q, tree_index, tree_slice

_LOG2PIE = 2.837877066409345  # log(2*pi*e)


def slot_degrees(graph: ModelGraph, var) -> np.ndarray:
    """Static per-slot degree of a random variable (factor copies per slot)."""
    n = var.length if var.is_array else 1
    deg = np.zeros(n, dtype=np.int64)
    for f in graph.factors:
        for v in f.all_interfaces().values():
            if isinstance(v, Ref) and v.var is var:
                cov = _coverage(f, v)
                if cov is None:
                    # shared (scalar) interface: a plated factor is plate.size copies
                    deg[0] += f.plate.size if f.plate is not None else 1
                elif isinstance(cov, int):
                    deg[cov] += 1
                else:
                    deg[cov[0]:cov[1]] += 1
    return deg


def gaussian_pair_entropy(covs_out, covs_in, cross_out_in):
    """Entropy of the joint Gaussian (out, in) per pair.

    cross_out_in: Cov(out, in), shape (..., d, d) (or scalar for d=1 chains)."""
    if jnp.ndim(cross_out_in) <= 1:  # scalar chain
        det = covs_out * covs_in - cross_out_in**2
        return _LOG2PIE + 0.5 * jnp.log(det)
    d = covs_out.shape[-1]
    top = jnp.concatenate([covs_out, cross_out_in], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(cross_out_in, -1, -2), covs_in], axis=-1)
    joint = jnp.concatenate([top, bot], axis=-2)
    return d * _LOG2PIE + 0.5 * pd_logdet(joint)


def discrete_pair_entropy(xis):
    """H of pairwise categorical q(out, in): -Σ xi log xi."""
    return -jnp.sum(xis * jnp.log(jnp.clip(xis, 1e-37)), axis=(-2, -1))


class FactorFE:
    """Per-factor free-energy contribution evaluator (compiled once)."""

    def __init__(self, factor: Factor, is_chain_transition: bool, chain_scalar: bool):
        self.factor = factor
        self.is_chain_transition = is_chain_transition
        self.chain_scalar = chain_scalar
        self.energy_fn = get_average_energy(factor.fform)

    def __call__(self, state, data, chain_cross):
        f = self.factor
        n_copies = f.plate.size if f.plate is not None else 1
        q = build_q(f, state, data, chain_cross=chain_cross)
        ae = self.energy_fn(q)
        # Missing-data correction: removing an unobserved likelihood factor
        # changes FE by exactly -AE_a (its entropy term cancels against the
        # degree decrement), so masking AE alone is exact.
        from .blocks import factor_data_mask

        mask = factor_data_mask(f, data)
        if mask is not None:
            ae = ae * mask
        # A plated factor with only shared/scalar interfaces yields a scalar
        # energy that stands for plate.size copies.
        if jnp.ndim(ae) == 0 and n_copies > 1:
            ae = ae * n_copies
        ae = jnp.sum(ae)

        # factor-local entropy H[q_a]
        if self.is_chain_transition:
            name = f.out.var.name
            cross = chain_cross[name]
            q_out, q_in = q["out"], q["in"]
            if f.fform == "DiscreteTransition":
                h = jnp.sum(discrete_pair_entropy(cross))
            elif f.fform == "AR":
                # AR transition is degenerate in the embedded state (shift
                # rows); the effective cluster is (out_0, in) of dim k+1.
                v00 = q_out.cov()[..., 0:1, 0:1]
                c0 = cross[..., 0:1, :]
                h = jnp.sum(
                    gaussian_pair_entropy(v00, q_in.cov(), c0)
                )
            else:
                h = jnp.sum(
                    gaussian_pair_entropy(
                        q_out.var() if self.chain_scalar else q_out.cov(),
                        q_in.var() if self.chain_scalar else q_in.cov(),
                        cross,
                    )
                )
        else:
            h = 0.0
            for name, v in f.all_interfaces().items():
                qv = q.get(name)
                if qv is None or isinstance(qv, PointMass):
                    continue
                if isinstance(v, Ref) and v.var.kind == "random":
                    hv = qv.entropy()
                    # shared interface of a plated factor → one copy per slot
                    if f.plate is not None and _coverage(f, v) is None:
                        hv = hv * n_copies
                    h = h + jnp.sum(hv)
        return ae - h


def variable_entropy_term(graph: ModelGraph, state, degrees: dict):
    """Σ_i (d_i - 1) H[q_i] over random variables (per slot).

    PointMass marginals (form-constrained) contribute zero — their -inf
    entropies cancel against the factor-side terms per CountingReal semantics."""
    total = 0.0
    for var in graph.random_variables():
        q = state[var.name]
        if isinstance(q, PointMass):
            continue
        h = q.entropy()
        deg = degrees[var.name]
        if var.is_array:
            total = total + jnp.sum((jnp.asarray(deg, jnp.float32) - 1.0) * h)
        else:
            total = total + (float(deg[0]) - 1.0) * jnp.sum(h)
    return total
