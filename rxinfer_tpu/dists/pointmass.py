"""PointMass and SampleList.

Reference: BayesBase PointMass (degenerate distribution carrying observed/constant
values through rules) and SampleList (importance-weighted sample approximations used
by SampleListFormConstraint, src/constraints/form/form_sample_list.jl).
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import Distribution, dist_dataclass, register_prod


@dist_dataclass
class PointMass(Distribution):
    """Degenerate distribution delta(x - point).

    Entropy is -inf; the free-energy assembly accounts for this symbolically at
    compile time via CountingReal semantics (base.CountingReal) rather than emitting
    non-finite values into the XLA program (reference:
    src/model/plugins/reactivemp_free_energy.jl:108-123).
    """

    point: jnp.ndarray

    def mean(self):
        return self.point

    def mode(self):
        return self.point

    def var(self):
        return jnp.zeros_like(self.point)

    def cov(self):
        p = jnp.asarray(self.point)
        if p.ndim == 0:
            return jnp.zeros_like(p)
        d = p.shape[-1]
        return jnp.zeros(p.shape[:-1] + (d, d), p.dtype)

    def entropy(self):
        return -jnp.inf

    def logpdf(self, x):
        return jnp.where(jnp.all(x == self.point), jnp.inf, -jnp.inf)

    def batch_shape(self):
        return ()


def _prod_pointmass_any(p: PointMass, other):
    # delta * anything = delta at the same point (unnormalized weight ignored by
    # normalized-product semantics).
    del other
    return p


# PointMass absorbs products with any family — register lazily on first use.
def register_pointmass_products(*types):
    for t in types:
        register_prod(PointMass, t, symmetric=False)(_prod_pointmass_any)
        register_prod(t, PointMass, symmetric=False)(lambda a, b: _prod_pointmass_any(b, a))


register_prod(PointMass, PointMass)(lambda a, b: a)


@dist_dataclass
class SampleList(Distribution):
    """Weighted sample approximation: samples (..., N, event...), log_weights (..., N)."""

    samples: jnp.ndarray
    log_weights: jnp.ndarray

    def _w(self):
        lw = self.log_weights - jnp.max(self.log_weights, axis=-1, keepdims=True)
        w = jnp.exp(lw)
        return w / jnp.sum(w, axis=-1, keepdims=True)

    def mean(self):
        w = self._w()
        extra = self.samples.ndim - w.ndim
        return jnp.sum(w.reshape(w.shape + (1,) * extra) * self.samples, axis=w.ndim - 1)

    def var(self):
        w = self._w()
        m = self.mean()
        extra = self.samples.ndim - w.ndim
        wr = w.reshape(w.shape + (1,) * extra)
        centered = self.samples - jnp.expand_dims(m, axis=w.ndim - 1)
        return jnp.sum(wr * centered**2, axis=w.ndim - 1)

    def cov(self):
        w = self._w()
        m = self.mean()
        centered = self.samples - m[..., None, :]
        return jnp.einsum("...n,...ni,...nj->...ij", w, centered, centered)

    def entropy(self):
        # Entropy of a sample list is not well-defined without a density estimate;
        # reference returns an estimate via -mean(log_weights) under SampleListMeta.
        w = self._w()
        return -jnp.sum(w * jnp.log(jnp.clip(w, 1e-37)), axis=-1)

    def mode(self):
        # Highest-weight sample (reference BayesBase mode of a sample list).
        idx = jnp.argmax(self.log_weights, axis=-1)
        return jnp.take_along_axis(
            self.samples,
            idx.reshape(idx.shape + (1,) * (self.samples.ndim - idx.ndim)),
            axis=self.log_weights.ndim - 1,
        ).squeeze(self.log_weights.ndim - 1)

    def batch_shape(self):
        return jnp.shape(self.log_weights)[:-1]


class LogPdfMessage:
    """Function-form message: an unnormalized log-density over the target edge.

    Produced by the node-function rule fallback (reference:
    NodeFunctionRuleFallback, docs/src/manuals/inference/undefinedrules.md:82-113)
    when a node defines only ``logpdf``.  The carrier cannot enter conjugate
    natural-parameter products — a functional-form constraint (ProjectedTo /
    SampleList / PointMass) must project the product, exactly as the reference
    requires a ``q(x) :: ProjectedTo(...)`` constraint with the fallback.

    ``log_fn(x)`` may return extra trailing (plate) axes; they are summed —
    the log-density of a plate of factor copies is the sum of per-copy terms.
    """

    def __init__(self, log_fn, plate_axes: int = 0):
        self.log_fn = log_fn
        self.plate_axes = plate_axes

    def logpdf(self, x):
        import jax.numpy as jnp

        val = self.log_fn(x)
        if self.plate_axes:
            val = jnp.sum(val, axis=tuple(range(-self.plate_axes, 0)))
        return val
