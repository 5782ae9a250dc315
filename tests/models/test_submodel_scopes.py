"""Submodel scopes + submodel-scoped constraint blocks (reference: GraphPPL
nested contexts; @constraints ``for q in submodel`` / specific-instance
``(submodel, i)`` blocks,
docs/src/manuals/variational/constraints-specification.md:210-292)."""

import numpy as np

import rxinfer_tpu as rx
from rxinfer_tpu.dists import GammaShapeRate, PointMass


def _gauss_block(y, tag):
    """Submodel: iid Normal with unknown mean and precision."""
    with rx.scope(tag):
        mu = rx.Normal(mean=0.0, var=100.0)
        tau = rx.Gamma(shape=0.01, rate=0.01)
        for i in rx.plate(len(y)):
            y[i] = rx.Normal(mean=mu, precision=tau)


def test_scope_prefixes_posterior_names():
    @rx.model
    def m(y1, y2):
        _gauss_block(y1, "a")
        _gauss_block(y2, "b")

    rng = np.random.default_rng(0)
    y1 = (2.0 + 0.5 * rng.standard_normal(60)).astype(np.float32)
    y2 = (-1.0 + 2.0 * rng.standard_normal(60)).astype(np.float32)
    res = rx.infer(returnvars=rx.KeepLast(), 
        model=m, data={"y1": y1, "y2": y2}, iterations=15,
        initialization={"a/tau": GammaShapeRate(1.0, 1.0),
                        "b/tau": GammaShapeRate(1.0, 1.0)},
    )
    assert set(res.posteriors) == {"a/mu", "a/tau", "b/mu", "b/tau"}
    assert abs(float(res.posteriors["a/mu"].mean()) - 2.0) < 0.3
    assert abs(float(res.posteriors["b/mu"].mean()) + 1.0) < 0.8


def test_repeated_scope_names_get_instance_suffixes():
    @rx.model
    def m(y1, y2):
        _gauss_block(y1, "blk")
        _gauss_block(y2, "blk")

    rng = np.random.default_rng(1)
    y1 = rng.standard_normal(30).astype(np.float32)
    y2 = rng.standard_normal(30).astype(np.float32)
    res = rx.infer(returnvars=rx.KeepLast(), 
        model=m, data={"y1": y1, "y2": y2}, iterations=5,
        initialization={"blk/tau": GammaShapeRate(1.0, 1.0),
                        "blk:2/tau": GammaShapeRate(1.0, 1.0)},
    )
    assert {"blk/mu", "blk:2/mu"} <= set(res.posteriors)


def test_submodel_scoped_form_constraint():
    """A PointMass form constraint applied through a submodel block hits all
    instances of the scope (reference ``for q in submodel``)."""
    @rx.model
    def m(y1, y2):
        _gauss_block(y1, "blk")
        _gauss_block(y2, "blk")

    rng = np.random.default_rng(2)
    y1 = (1.0 + rng.standard_normal(40)).astype(np.float32)
    y2 = (3.0 + rng.standard_normal(40)).astype(np.float32)
    cons = rx.constraints(
        submodel={"blk": rx.constraints(
            forms={"tau": rx.PointMassFormConstraint()})}
    )
    res = rx.infer(returnvars=rx.KeepLast(), 
        model=m, data={"y1": y1, "y2": y2}, iterations=15, constraints=cons,
        initialization={"blk/tau": GammaShapeRate(1.0, 1.0),
                        "blk:2/tau": GammaShapeRate(1.0, 1.0)},
    )
    assert isinstance(res.posteriors["blk/tau"], PointMass)
    assert isinstance(res.posteriors["blk:2/tau"], PointMass)


def test_instance_specific_constraint_block():
    """'blk:2' targets only the second instance (reference ``(submodel, i)``)."""
    @rx.model
    def m(y1, y2):
        _gauss_block(y1, "blk")
        _gauss_block(y2, "blk")

    rng = np.random.default_rng(3)
    y1 = rng.standard_normal(40).astype(np.float32)
    y2 = rng.standard_normal(40).astype(np.float32)
    cons = rx.constraints(
        submodel={"blk:2": rx.constraints(
            forms={"tau": rx.PointMassFormConstraint()})}
    )
    res = rx.infer(returnvars=rx.KeepLast(), 
        model=m, data={"y1": y1, "y2": y2}, iterations=10, constraints=cons,
        initialization={"blk/tau": GammaShapeRate(1.0, 1.0),
                        "blk:2/tau": GammaShapeRate(1.0, 1.0)},
    )
    assert isinstance(res.posteriors["blk:2/tau"], PointMass)
    assert not isinstance(res.posteriors["blk/tau"], PointMass)


def test_unknown_scope_key_raises():
    @rx.model
    def m(y):
        _gauss_block(y, "blk")

    y = np.zeros(10, np.float32)
    cons = rx.constraints(
        submodel={"nope": rx.constraints(factorization=rx.MeanField())}
    )
    try:
        rx.infer(returnvars=rx.KeepLast(), model=m, data={"y": y}, iterations=2, constraints=cons,
                 initialization={"blk/tau": GammaShapeRate(1.0, 1.0)})
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "nope" in str(e)


def test_scoped_meanfield_matches_global_meanfield():
    """MeanField scoped to the single submodel == global MeanField when the
    whole model is that submodel."""
    @rx.model
    def m(y):
        _gauss_block(y, "blk")

    rng = np.random.default_rng(4)
    y = (0.5 + rng.standard_normal(50)).astype(np.float32)
    init = {"blk/tau": GammaShapeRate(1.0, 1.0)}
    r_scoped = rx.infer(returnvars=rx.KeepLast(), 
        model=m, data={"y": y}, iterations=12, free_energy=True,
        constraints=rx.constraints(
            submodel={"blk": rx.constraints(factorization=rx.MeanField())}),
        initialization=init,
    )
    r_global = rx.infer(returnvars=rx.KeepLast(), 
        model=m, data={"y": y}, iterations=12, free_energy=True,
        constraints=rx.constraints(factorization=rx.MeanField()),
        initialization=init,
    )
    np.testing.assert_allclose(
        np.asarray(r_scoped.free_energy), np.asarray(r_global.free_energy),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(r_scoped.posteriors["blk/mu"].mean()),
        float(r_global.posteriors["blk/mu"].mean()), rtol=1e-6,
    )


def test_submodel_type_scoped_initialization():
    """('blk', 'tau') init keys apply to every instance of the submodel type
    (reference `@initialization for init in submodel`,
    src/model/plugins/initialization_plugin.jl:190-199)."""
    rng = np.random.default_rng(0)
    y1 = (1.5 + 0.5 * rng.standard_normal(80)).astype(np.float32)
    y2 = (-1.0 + 0.5 * rng.standard_normal(80)).astype(np.float32)

    @rx.model
    def two_blocks(y1, y2):
        out = {}
        for name, y in (("a", y1), ("b", y2)):
            with rx.scope("blk"):
                mu = rx.Normal(mean=0.0, var=100.0)
                tau = rx.Gamma(shape=1.0, rate=1.0)
                for i in rx.plate(len(y)):
                    (y1 if name == "a" else y2)[i] = rx.Normal(
                        mean=mu, precision=tau)
                out[name] = mu
        return out

    res = rx.infer(returnvars=rx.KeepLast(), 
        model=two_blocks, data={"y1": y1, "y2": y2}, iterations=15,
        initialization={("blk", "tau"): GammaShapeRate(1.0, 1.0)},
    )
    assert abs(float(res.posteriors["a"].mean()) - 1.5) < 0.2
    assert abs(float(res.posteriors["b"].mean()) - (-1.0)) < 0.2


def test_submodel_type_scoped_initialization_unknown_raises():
    @rx.model
    def m(y):
        mu = rx.Normal(mean=0.0, var=1.0)
        y.observe(rx.Normal(mean=mu, var=1.0))
        return {"mu": mu}

    try:
        rx.infer(model=m, data={"y": np.float32(0.3)},
                 initialization={("nope", "tau"): GammaShapeRate(1.0, 1.0)})
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "matches no" in str(e)
