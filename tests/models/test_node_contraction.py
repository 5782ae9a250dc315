"""Node contraction: `infer(allow_node_contraction=True)`.

Mirrors /root/reference/test/inference/inference_tests.jl:526-686 ("Static
inference with node contraction"): a @submodel whose name has a REGISTERED
node type is emitted as a single factor node (the user's rules drive it —
here they forward to the built-in GCV rules via rx.call_rule, exactly like
the reference's `@rule typeof(gcv)(:y, ...) = @call_rule GCV(...)`), instead
of tracing the submodel body."""

import jax.numpy as jnp
import numpy as np
import pytest

import rxinfer_tpu as rx
from rxinfer_tpu.dists import NormalMeanVariance
from rxinfer_tpu.rules import node

KAPPA, OMEGA = 1.0, -1.0


@node("gcv_sub")
class GcvSubNode:
    """Contracted submodel node; rules forward to GCV (x ≡ GCV's 'in')."""

    interfaces = ("out", "x", "z")
    needs_self_marginal = True  # GCV's z-rule divides out q(z)
    cavity_cluster = ("out", "x")  # GCV keeps q(out, in) joint

    @staticmethod
    def _fwd(q):
        fw = {"in": q["x"], "z": q["z"]}
        if "out" in q:
            fw["out"] = q["out"]
        return fw

    @staticmethod
    def message_to_out(q):
        return rx.call_rule("GCV", "out", **GcvSubNode._fwd(q),
                            kappa=_pm(KAPPA), omega=_pm(OMEGA))

    @staticmethod
    def message_to_x(q):
        return rx.call_rule("GCV", "in", **GcvSubNode._fwd(q),
                            kappa=_pm(KAPPA), omega=_pm(OMEGA))

    @staticmethod
    def message_to_z(q):
        fw = {"in": q["x"], "out": q["out"], "z": q["z"]}
        return rx.call_rule("GCV", "z", **fw,
                            kappa=_pm(KAPPA), omega=_pm(OMEGA))

    @staticmethod
    def average_energy(q):
        return rx.call_rule("GCV", "average_energy", **GcvSubNode._fwd(q),
                            kappa=_pm(KAPPA), omega=_pm(OMEGA))


def _pm(v):
    from rxinfer_tpu.dists import PointMass

    return PointMass(jnp.asarray(v, jnp.float32))


@rx.submodel
def gcv_sub(x=None, z=None):
    """Submodel BODY (traced when contraction is off): the explicit GCV
    factor — the same generative object the contracted rules implement."""
    return rx.GCV(x, z, kappa=KAPPA, omega=OMEGA)


def _model():
    @rx.model
    def m(y):
        T = len(y)
        named = {}
        x_prev = rx.Normal(mean=0.0, var=1.0)
        named["x0"] = x_prev
        for t in range(T):
            z = rx.Normal(mean=0.0, var=0.5)
            x = gcv_sub(x=x_prev, z=z)
            y[t] = rx.Normal(mean=x, var=0.1)
            named[f"z{t}"] = z
            named[f"x{t + 1}"] = x
            x_prev = x
        return named

    return m


def _data():
    rng = np.random.default_rng(11)
    return rng.normal(0.0, 1.0, size=4).astype(np.float32)


def _init(T):
    d = {f"x{t}": NormalMeanVariance(0.0, 1.0) for t in range(T + 1)}
    d.update({f"z{t}": NormalMeanVariance(0.0, 0.5) for t in range(T)})
    return d


def test_contracted_submodel_runs_and_matches_flat():
    y = _data()
    init = _init(len(y))

    res_c = rx.infer(
        model=_model(), data={"y": y}, iterations=15, free_energy=True,
        returnvars=rx.KeepLast(), constraints=rx.MeanField(),
        initialization=init, allow_node_contraction=True,
    )
    # same graph built from the explicit GCV node (no contraction): the
    # forwarding rules must reproduce it exactly
    res_f = rx.infer(
        model=_model(), data={"y": y}, iterations=15, free_energy=True,
        returnvars=rx.KeepLast(), constraints=rx.MeanField(),
        initialization=init,
    )

    fe_c = np.asarray(res_c.free_energy)
    fe_f = np.asarray(res_f.free_energy)
    assert np.all(np.isfinite(fe_c))
    # reference asserts all(!isnan, ...) and all(<=(0), diff(free_energy))
    # for the contracted run (inference_tests.jl:640-645)
    assert np.all(np.diff(fe_c) <= 1e-4)
    # The contracted node is whole-factor mean-field (the structured
    # q(out,in) pair entropy is the built-in GCV node's own refinement), so
    # FE/posteriors agree loosely, not bitwise.
    assert abs(fe_c[-1] - fe_f[-1]) < 0.5
    for k in res_f.posteriors:
        qc, qf = res_c.posteriors[k], res_f.posteriors[k]
        assert np.isfinite(float(qc.mean())) and np.isfinite(float(qc.var()))
        np.testing.assert_allclose(float(qc.mean()), float(qf.mean()),
                                   atol=0.15)


def test_contraction_off_traces_body():
    """Without the kwarg the submodel body is traced: the graph contains the
    explicit GCV factor, not the contracted node."""
    y = _data()
    g_off = _model().trace({"y": y})
    g_on = _model().trace({"y": y}, allow_node_contraction=True)
    fforms_off = {f.fform for f in g_off.factors}
    fforms_on = {f.fform for f in g_on.factors}
    assert "GCV" in fforms_off and "gcv_sub" not in fforms_off
    assert "gcv_sub" in fforms_on and "GCV" not in fforms_on


def test_contraction_requires_kwargs():
    @rx.model
    def m(y):
        x0 = rx.Normal(mean=0.0, var=1.0)
        z = rx.Normal(mean=0.0, var=0.5)
        x = gcv_sub(x0, z=z)  # positional arg -> error under contraction
        y.observe(rx.Normal(mean=x, var=0.1))
        return {}

    with pytest.raises(TypeError, match="keyword arguments"):
        m.trace({"y": np.float32(0.0)}, allow_node_contraction=True)
