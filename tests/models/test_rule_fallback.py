"""NodeFunctionRuleFallback — inference with undefined message rules.

Reference: docs/src/manuals/inference/undefinedrules.md:82-113 — a custom
stochastic node defining only ``logpdf``; messages fall back to the node
function and a ``ProjectedTo`` form constraint projects the non-conjugate
product onto the exponential family.
"""

import jax.numpy as jnp
import numpy as np

import rxinfer_tpu as rx
from rxinfer_tpu.dists import Beta as BetaDist
from rxinfer_tpu.engine.projection import ProjectedTo
from rxinfer_tpu.rules.expectations import e_mean
from rxinfer_tpu.rules.registry import node


@node("LogpdfBernoulli")
class LogpdfBernoulliNode:
    """Bernoulli likelihood declared ONLY via its logpdf (reference:
    BernoulliDistribution example, undefinedrules.md — '(out, p) ->
    logpdf(Bernoulli(p), out)')."""

    interfaces = ("out", "p")

    @staticmethod
    def logpdf(values):
        y, p = values["out"], values["p"]
        p = jnp.clip(p, 1e-6, 1.0 - 1e-6)
        return y * jnp.log(p) + (1.0 - y) * jnp.log1p(-p)


def test_rule_fallback_with_projection():
    hidden_p = 1.0 / 3.1415
    rng = np.random.default_rng(7)
    y = (rng.uniform(size=1000) < hidden_p).astype(np.float32)

    @rx.model
    def simple_model(y):
        p = rx.Beta(1.0, 1.0)
        for i in rx.plate(len(y)):
            y[i] = rx.factor_node("LogpdfBernoulli", p=p)
        return {"p": p}

    cons = rx.constraints(forms={"p": ProjectedTo("beta")})
    res = rx.infer(returnvars=rx.KeepLast(), 
        model=simple_model, data={"y": y}, iterations=8,
        constraints=cons, initialization={"p": BetaDist(1.0, 1.0)},
        options={"rulefallback": rx.NodeFunctionRuleFallback()},
    )
    q = res.posteriors["p"]
    n, h = len(y), float(y.sum())
    exact_mean = (1.0 + h) / (2.0 + n)
    assert abs(float(q.mean()) - exact_mean) < 0.02, (float(q.mean()), exact_mean)


def test_rule_fallback_requires_form_constraint():
    y = np.asarray([1.0, 0.0, 1.0], np.float32)

    @rx.model
    def m(y):
        p = rx.Beta(1.0, 1.0)
        for i in rx.plate(len(y)):
            y[i] = rx.factor_node("LogpdfBernoulli", p=p)
        return {"p": p}

    try:
        rx.infer(returnvars=rx.KeepLast(), model=m, data={"y": y}, iterations=2,
                 initialization={"p": BetaDist(1.0, 1.0)},
                 options={"rulefallback": rx.NodeFunctionRuleFallback()})
        raise AssertionError("expected ProductError")
    except Exception as e:
        assert "ProjectedTo" in str(e)


def test_missing_rule_without_fallback_raises():
    y = np.asarray([1.0], np.float32)

    @rx.model
    def m(y):
        p = rx.Beta(1.0, 1.0)
        y[0] = rx.factor_node("LogpdfBernoulli", p=p)
        return {"p": p}

    try:
        rx.infer(returnvars=rx.KeepLast(), model=m, data={"y": y}, iterations=1,
                 initialization={"p": BetaDist(1.0, 1.0)})
        raise AssertionError("expected RuleNotFoundError")
    except Exception as e:
        assert "Rule not found" in str(e) or "rule" in str(e).lower()


def test_message_form_constraint_projects_fallback_messages():
    """μ(p)::ProjectedTo — message-form constraints absorb logpdf fallback
    messages per message instead of at the marginal product (reference
    μ(x)::C, docs/src/manuals/variational/constraints-specification.md)."""
    hidden_p = 0.3
    rng = np.random.default_rng(11)
    y = (rng.uniform(size=800) < hidden_p).astype(np.float32)

    @rx.model
    def m(y):
        p = rx.Beta(1.0, 1.0)
        for i in rx.plate(len(y)):
            y[i] = rx.factor_node("LogpdfBernoulli", p=p)
        return {"p": p}

    cons = rx.constraints(message_forms={"p": ProjectedTo("beta")})
    res = rx.infer(returnvars=rx.KeepLast(), 
        model=m, data={"y": y}, iterations=8,
        constraints=cons, initialization={"p": BetaDist(1.0, 1.0)},
        options={"rulefallback": rx.NodeFunctionRuleFallback()},
    )
    q = res.posteriors["p"]
    n, h = len(y), float(y.sum())
    exact_mean = (1.0 + h) / (2.0 + n)
    assert abs(float(q.mean()) - exact_mean) < 0.02


def test_stacked_form_constraints():
    """q(x)::C1::C2 composition: sample-list then point-mass collapse."""
    rng = np.random.default_rng(3)
    y = (rng.uniform(size=200) < 0.7).astype(np.float32)

    @rx.model
    def coin(y):
        p = rx.Beta(2.0, 2.0)
        for i in rx.plate(len(y)):
            y[i] = rx.Bernoulli(p)
        return {"p": p}

    from rxinfer_tpu.dists import Beta as BD, PointMass

    cons = rx.constraints(forms={
        "p": (rx.FixedMarginalFormConstraint(BD(5.0, 5.0)),
              rx.PointMassFormConstraint()),
    })
    res = rx.infer(returnvars=rx.KeepLast(), model=coin, data={"y": y}, iterations=4, constraints=cons)
    q = res.posteriors["p"]
    assert isinstance(q, PointMass)
    # pinned Beta(5,5) then MAP-collapsed: mode = 0.5 regardless of data
    assert abs(float(q.mean()) - 0.5) < 1e-6
