"""Boolean nodes + user-defined custom node (reference: boolean aliases
src/model/graphppl.jl:134-167; custom Halfspace node defined inside the test
suite, test/models/statespace/collision_tests.jl:10-37)."""

import numpy as np
import jax.numpy as jnp

import rxinfer_tpu as rx
from rxinfer_tpu.dists import Bernoulli as BernoulliDist, Beta as BetaDist


def test_noisy_or_inference():
    """Two causes, OR-composed effect observed: explaining-away posteriors."""

    @rx.model
    def hard_or(y):
        a = rx.Bernoulli(0.3)
        b = rx.Bernoulli(0.1)
        y.observe(rx.OR(a, b))      # the effect itself is observed
        return {"a": a, "b": b}

    y = np.float32(1.0)  # observed effect present
    res = rx.infer(returnvars=rx.KeepLast(), 
        model=hard_or, data={"y": np.asarray(y)}, iterations=10,
        initialization={"a": BernoulliDist(0.3), "b": BernoulliDist(0.1)},
    )
    pa = float(res.posteriors["a"].mean())
    pb = float(res.posteriors["b"].mean())
    # exact posteriors: P(a=1|c=1) = P(a)·P(c=1|a)/P(c=1) with OR semantics
    p_c = 1 - 0.7 * 0.9
    pa_exact = 0.3 / p_c
    pb_exact = 0.1 / p_c
    assert abs(pa - pa_exact) < 0.12, (pa, pa_exact)
    assert abs(pb - pb_exact) < 0.12, (pb, pb_exact)
    # explaining-away ordering: a (higher prior) more likely than b
    assert pa > pb


def test_custom_node_extension():
    """User-defined node with @rules.node — the reference's custom-node
    extension point (@node/@rule defined in user code)."""
    from rxinfer_tpu.rules import node
    from rxinfer_tpu.rules.expectations import e_mean

    @node("NoisyCoin")
    class NoisyCoinNode:
        """out ~ Bernoulli(flip_prob * (1-p) + (1-flip_prob) * p)."""

        interfaces = ("out", "p")
        FLIP = 0.1

        @staticmethod
        def message_to_out(q):
            p = e_mean(q["p"])
            return BernoulliDist(0.1 * (1 - p) + 0.9 * p)

        needs_self_marginal = True  # EM-style expected-statistic message

        @staticmethod
        def message_to_p(q):
            y = e_mean(q["out"])
            p = e_mean(q["p"])
            # posterior probability the latent (pre-flip) coin was heads
            heads = (
                y * (0.9 * p) / (0.9 * p + 0.1 * (1 - p))
                + (1 - y) * (0.1 * p) / (0.1 * p + 0.9 * (1 - p))
            )
            return BetaDist(1.0 + heads, 2.0 - heads)

        @staticmethod
        def average_energy(q):
            p = e_mean(q["p"])
            y = e_mean(q["out"])
            eff = 0.1 * (1 - p) + 0.9 * p
            return -(y * jnp.log(eff) + (1 - y) * jnp.log(1 - eff))

    # emit the custom node through the extension API
    from rxinfer_tpu.graph.dsl import _as_interface, _builder

    @rx.model
    def coin2(y):
        theta = rx.Beta(2.0, 2.0)
        for i in rx.plate(len(y)):
            out = _builder().emit("NoisyCoin", {"p": _as_interface(theta)})
            y[i] = out
        return {"theta": theta}

    rng = np.random.default_rng(0)
    true_p = 0.8
    eff = 0.1 * (1 - true_p) + 0.9 * true_p
    y = (rng.uniform(size=300) < eff).astype(np.float32)
    res = rx.infer(returnvars=rx.KeepLast(), model=coin2, data={"y": y}, iterations=10,
                   initialization={"theta": BetaDist(2.0, 2.0)},
                   free_energy=True)
    q = res.posteriors["theta"]
    assert abs(float(q.mean()) - true_p) < 0.12
    assert np.isfinite(np.asarray(res.free_energy)).all()
