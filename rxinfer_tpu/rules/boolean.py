"""Boolean logic nodes over Bernoulli variables: OR, AND, NOT, IMPLY.

Reference: boolean node aliases registered by the GraphPPL backend
(src/model/graphppl.jl:134-167: ``||``→OR, ``&&``→AND, ``¬``→NOT, ``->``→IMPLY).
Messages are exact sum-product contractions of the 0/1 truth table with the
incoming Bernoulli marginals (two-state categorical algebra on the VPU).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import xlogy

from ..dists import Bernoulli
from .expectations import e_mean
from .registry import node


def _p(q, name):
    return e_mean(q[name])


def _msg(p_num, p_den):
    total = p_num + p_den
    return Bernoulli(jnp.clip(p_num / jnp.clip(total, 1e-30), 1e-7, 1 - 1e-7))


class _TruthTable:
    """Generic 2-input boolean factor out = op(in1, in2); exact BP messages via
    EP cavity division (engine stores this factor's previous messages)."""

    uses_cavity = True

    # subclasses define op(a, b) -> 0/1 for python ints
    @classmethod
    def _table(cls):
        import numpy as np

        t = np.zeros((2, 2, 2), np.float32)  # [out, in1, in2]
        for a in (0, 1):
            for b in (0, 1):
                t[cls.op(a, b), a, b] = 1.0
        return jnp.asarray(t)

    @classmethod
    def message_to_out(cls, q):
        t = cls._table()
        p1, p2 = _p(q, "in1"), _p(q, "in2")
        w1 = jnp.stack([1 - p1, p1], axis=-1)
        w2 = jnp.stack([1 - p2, p2], axis=-1)
        probs = jnp.einsum("oab,...a,...b->...o", t, w1, w2, precision="highest")
        return _msg(probs[..., 1], probs[..., 0])

    @classmethod
    def message_to_in1(cls, q):
        t = cls._table()
        po, p2 = _p(q, "out"), _p(q, "in2")
        wo = jnp.stack([1 - po, po], axis=-1)
        w2 = jnp.stack([1 - p2, p2], axis=-1)
        probs = jnp.einsum("oab,...o,...b->...a", t, wo, w2, precision="highest")
        return _msg(probs[..., 1], probs[..., 0])

    @classmethod
    def message_to_in2(cls, q):
        t = cls._table()
        po, p1 = _p(q, "out"), _p(q, "in1")
        wo = jnp.stack([1 - po, po], axis=-1)
        w1 = jnp.stack([1 - p1, p1], axis=-1)
        probs = jnp.einsum("oab,...o,...a->...b", t, wo, w1, precision="highest")
        return _msg(probs[..., 1], probs[..., 0])

    @classmethod
    def bethe_term(cls, q):
        """Delta-node Bethe contribution -H[q_a] from cavity messages: the
        joint belief q(out, in1, in2) ∝ table·μ_out·μ_in1·μ_in2 (reference:
        deterministic-node FactorBoundFreeEnergy; E[-log f] = 0 on the
        truth-table support)."""
        t = cls._table()
        po, p1, p2 = _p(q, "out"), _p(q, "in1"), _p(q, "in2")
        wo = jnp.stack([1 - po, po], axis=-1)
        w1 = jnp.stack([1 - p1, p1], axis=-1)
        w2 = jnp.stack([1 - p2, p2], axis=-1)
        joint = jnp.einsum("oab,...o,...a,...b->...oab", t, wo, w1, w2, precision="highest")
        joint = joint / jnp.clip(jnp.sum(joint, axis=(-3, -2, -1), keepdims=True), 1e-30)
        h = -jnp.sum(joint * jnp.log(jnp.clip(joint, 1e-37)), axis=(-3, -2, -1))
        return -h


@node("OR")
class ORNode(_TruthTable):
    interfaces = ("out", "in1", "in2")

    @staticmethod
    def op(a, b):
        return int(a or b)


@node("AND")
class ANDNode(_TruthTable):
    interfaces = ("out", "in1", "in2")

    @staticmethod
    def op(a, b):
        return int(a and b)


@node("IMPLY")
class IMPLYNode(_TruthTable):
    interfaces = ("out", "in1", "in2")

    @staticmethod
    def op(a, b):
        return int((not a) or b)


@node("NOT")
class NOTNode:
    interfaces = ("out", "in")
    uses_cavity = True

    @staticmethod
    def message_to_out(q):
        return Bernoulli(1.0 - _p(q, "in"))

    @staticmethod
    def message_to_in(q):
        return Bernoulli(1.0 - _p(q, "out"))

    @staticmethod
    def bethe_term(q):
        """-H of the joint q(out, in) ∝ δ(out = ¬in)·μ_out·μ_in — one bit of
        freedom, entropy of the fused Bernoulli."""
        po, pi = _p(q, "out"), _p(q, "in")
        p1 = (1.0 - po) * pi  # in = 1 (hence out = 0)
        p0 = po * (1.0 - pi)
        z = jnp.clip(p0 + p1, 1e-30)
        p = p1 / z
        h = -(xlogy(p, p) + xlogy(1.0 - p, 1.0 - p))
        return -h
