"""Per-submodel default constraints (reference:
``GraphPPL.default_constraints(::typeof(inner)) = @constraints ...``,
docs/src/manuals/variational/constraints-specification.md:240-256): declared
once on the submodel type via ``@rx.submodel(default_constraints=...)``, they
apply to every instance unless the user's constraints target that instance."""

import numpy as np

import rxinfer_tpu as rx
from rxinfer_tpu.dists import GammaShapeRate, PointMass


@rx.submodel(default_constraints=rx.constraints(
    forms={"tau": rx.PointMassFormConstraint()}))
def gauss_block(y):
    mu = rx.Normal(mean=0.0, var=100.0)
    tau = rx.Gamma(shape=0.01, rate=0.01)
    for i in rx.plate(len(y)):
        y[i] = rx.Normal(mean=mu, precision=tau)
    return mu, tau


def _make_data(seed=0):
    rng = np.random.default_rng(seed)
    y1 = (2.0 + 0.5 * rng.standard_normal(60)).astype(np.float32)
    y2 = (-1.0 + 2.0 * rng.standard_normal(60)).astype(np.float32)
    return y1, y2


INIT = {"gauss_block/tau": GammaShapeRate(1.0, 1.0),
        "gauss_block:2/tau": GammaShapeRate(1.0, 1.0)}


@rx.model
def two_blocks(y1, y2):
    gauss_block(y1)
    gauss_block(y2)


def test_default_constraints_apply_to_every_instance():
    y1, y2 = _make_data()
    res = rx.infer(returnvars=rx.KeepLast(), model=two_blocks, data={"y1": y1, "y2": y2}, iterations=15,
                   initialization=INIT)
    # the @submodel decorator names scopes after the function
    assert {"gauss_block/mu", "gauss_block:2/mu"} <= set(res.posteriors)
    # default PointMass form constraint hit both instances
    assert isinstance(res.posteriors["gauss_block/tau"], PointMass)
    assert isinstance(res.posteriors["gauss_block:2/tau"], PointMass)
    assert abs(float(res.posteriors["gauss_block/mu"].mean()) - 2.0) < 0.3


def test_user_submodel_block_overrides_default():
    """A user constraints block targeting one instance suppresses the default
    for that instance only (reference: 'unless otherwise specified')."""
    y1, y2 = _make_data(1)
    cons = rx.constraints(submodel={"gauss_block:2": rx.constraints()})
    res = rx.infer(returnvars=rx.KeepLast(), model=two_blocks, data={"y1": y1, "y2": y2}, iterations=15,
                   constraints=cons, initialization=INIT)
    assert isinstance(res.posteriors["gauss_block/tau"], PointMass)
    assert isinstance(res.posteriors["gauss_block:2/tau"], GammaShapeRate)


@rx.submodel(default_init={"tau": GammaShapeRate(1.0, 1.0)})
def init_block(y):
    """Loopy mean/precision block needing tau init — supplied as the
    submodel TYPE's default (reference GraphPPL.default_init,
    test/model/initialization_plugin_tests.jl:1161-1186)."""
    mu = rx.Normal(mean=0.0, var=100.0)
    tau = rx.Gamma(shape=0.01, rate=0.01)
    for i in rx.plate(len(y)):
        y[i] = rx.Normal(mean=mu, precision=tau)
    return mu, tau


def test_default_init_applies_to_every_instance():
    y1, y2 = _make_data(3)

    @rx.model
    def two(y1, y2):
        init_block(y1)
        init_block(y2)

    # no initialization= at all: the submodel default covers both instances
    res = rx.infer(model=two, data={"y1": y1, "y2": y2}, iterations=15,
                   returnvars=rx.KeepLast(), free_energy=True)
    mus = {k: float(v.mean()) for k, v in res.posteriors.items()
           if k.endswith("/mu")}
    assert abs(mus["init_block/mu"] - 2.0) < 0.3
    assert abs(mus["init_block:2/mu"] - (-1.0)) < 0.7
    fe = np.asarray(res.free_energy)
    assert (np.diff(fe) <= 1e-3).all()


def test_default_init_user_override_wins():
    y1, y2 = _make_data(4)

    @rx.model
    def two(y1, y2):
        init_block(y1)
        init_block(y2)

    # a deliberately terrible user init for instance 2 slows its convergence:
    # proves the user's key takes precedence over the default
    res_bad = rx.infer(
        model=two, data={"y1": y1, "y2": y2}, iterations=1,
        returnvars=rx.KeepLast(), free_energy=True,
        initialization={"init_block:2/tau": GammaShapeRate(1000.0, 0.001)},
    )
    res_def = rx.infer(model=two, data={"y1": y1, "y2": y2}, iterations=1,
                       returnvars=rx.KeepLast(), free_energy=True)
    # different first-sweep FE => the override was actually used
    assert abs(float(res_bad.free_energy[0])
               - float(res_def.free_energy[0])) > 1e-3
