"""Constraints specification (reference: GraphPPL @constraints DSL +
src/constraints/form/*.jl form constraints).

Factorization: the engine's default factorization is already the reference's
common operating point — structured pairwise on chains, mean-field between
variable groups (what @constraints MeanField() / q(x,y)=q(x)q(y) select in the
reference test-suite).  ``MeanField()`` / ``factorize()`` specs are accepted and
validated; requesting a *joint* (non-factorized) q across distinct groups is not
supported yet and raises.

Functional-form constraints (reference src/constraints/form/):
  PointMassFormConstraint  — collapse a marginal to its MAP point
  SampleListFormConstraint — sample-list approximation of the marginal
  FixedMarginalFormConstraint — pin a marginal to a fixed distribution
Applied to a group's marginal after each product update (reference:
constrain_form in the message-product context).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp


class MeanField:
    """Fully factorized variational family (reference MeanField())."""


class FullFactorization:
    """Alias of the engine default (structured chains + factorized groups)."""


@dataclasses.dataclass
class Constraints:
    """Container passed to infer(constraints=...)."""

    factorization: Any = None
    forms: Optional[dict] = None  # var name -> form constraint


def constraints(factorization: Any = None, forms: Optional[dict] = None) -> Constraints:
    return Constraints(factorization, forms or {})


# ---------------------------------------------------------------------------------
# Functional form constraints
# ---------------------------------------------------------------------------------

class AbstractFormConstraint:
    def constrain(self, dist):
        raise NotImplementedError


class PointMassFormConstraint(AbstractFormConstraint):
    """MAP collapse (reference PointMassFormConstraint,
    src/constraints/form/form_point_mass.jl:53-205).  For the conjugate carrier
    families the mode is closed-form — no inner optimizer needed; an optimizer
    hook is accepted for custom densities."""

    def __init__(self, optimizer=None):
        self.optimizer = optimizer

    def constrain(self, dist):
        from ..dists import PointMass

        return PointMass(jnp.asarray(dist.mode()))


class FixedMarginalFormConstraint(AbstractFormConstraint):
    """Pin the marginal (reference FixedMarginalFormConstraint)."""

    def __init__(self, dist):
        self.dist = dist

    def constrain(self, dist):
        del dist
        return self.dist


class SampleListFormConstraint(AbstractFormConstraint):
    """Sample-list approximation (reference SampleListFormConstraint,
    src/constraints/form/form_sample_list.jl)."""

    def __init__(self, n_samples: int = 256, seed: int = 0):
        self.n_samples = n_samples
        self.seed = seed

    def constrain(self, dist):
        from ..dists import SampleList

        key = jax.random.PRNGKey(self.seed)
        samples = dist.sample(key, (self.n_samples,))  # (N, event...)
        return SampleList(samples, jnp.zeros((self.n_samples,)))
