"""Posterior annotations + postprocess strategies (reference:
src/inference/postprocess.jl, ReactiveMP LogScaleAnnotations — CHANGELOG v5
"`AddonLogScale` has been renamed to `LogScaleAnnotations`").

In the reference, every emitted posterior is a ``Marginal`` wrapper; the
postprocess strategy decides whether to strip it (``UnpackMarginalPostprocess``,
the default) or keep it so annotation data stays reachable via
``getannotations`` (``NoopPostprocess``, the default when
``annotations=LogScaleAnnotations()`` is passed).

Log-scale semantics here: the log normalization constant of the product of all
(properly scaled) messages at the variable.  On tree/chain models solved by
exact BP this equals log Z — the same value at every variable, computed from
the Bethe free energy (FE == −log Z on trees; asserted by the conformance
suite).  On loopy/variational models it is the ELBO-based estimate −FE (a lower
bound on log Z), which is also what model-comparison workflows difference into
Bayes factors.
"""

from __future__ import annotations

from typing import Any, Optional


class LogScaleAnnotations:
    """Request per-posterior log-scale annotations (reference
    ``infer(..., annotations = LogScaleAnnotations())``)."""

    def __repr__(self):
        return "LogScaleAnnotations()"


class Marginal:
    """Annotated posterior wrapper (reference ReactiveMP ``Marginal``).

    Attribute access forwards to the wrapped distribution, so
    ``marginal.mean()`` etc. keep working; the payload is reachable with
    ``getdata`` and the annotation dict with ``getannotations``."""

    __slots__ = ("dist", "annotations")

    def __init__(self, dist: Any, annotations: Optional[dict] = None):
        self.dist = dist
        self.annotations = dict(annotations or {})

    def __getattr__(self, name):
        return getattr(self.dist, name)

    def __repr__(self):
        keys = ", ".join(sorted(self.annotations))
        return f"Marginal({self.dist!r}, annotations=[{keys}])"


def getdata(marginal):
    """Unwrap a ``Marginal`` (reference ``ReactiveMP.getdata``)."""
    return marginal.dist if isinstance(marginal, Marginal) else marginal


def getannotations(marginal) -> dict:
    """Annotation dict of a wrapped posterior (reference
    ``ReactiveMP.getannotations``); empty for bare distributions."""
    return marginal.annotations if isinstance(marginal, Marginal) else {}


def getlogscale(marginal):
    """Log-scale annotation (reference ``getlogscale``): the log normalizer of
    the message product at this variable — log Z on exact tree models, the
    −FE evidence estimate on variational models.  Requires inference run with
    ``annotations=LogScaleAnnotations()``."""
    ann = getannotations(marginal)
    if "log_scale" not in ann:
        raise ValueError(
            "posterior carries no log-scale annotation; run "
            "infer(..., annotations=LogScaleAnnotations())."
        )
    return ann["log_scale"]


class UnpackMarginalPostprocess:
    """Strip the Marginal wrapper (reference UnpackMarginalPostprocess — the
    default when no annotations were requested)."""

    def __call__(self, marginal):
        return getdata(marginal)


class NoopPostprocess:
    """Keep posteriors as-is, preserving annotations (reference NoopPostprocess
    — the default when annotations are requested)."""

    def __call__(self, marginal):
        return marginal


def default_postprocess(annotations) -> Any:
    """Reference default-strategy rule (src/inference/postprocess.jl:14-19 of
    the docs): Unpack without annotations, Noop with them."""
    return NoopPostprocess() if annotations is not None else UnpackMarginalPostprocess()


def inference_postprocess(strategy, marginal):
    """Apply a postprocess strategy to one emitted posterior.  Custom
    strategies are any callable taking the (possibly wrapped) marginal
    (reference: custom ``inference_postprocess`` methods)."""
    return strategy(marginal)
