"""free_energy_diagnostics kwarg (reference src/score/diagnostics.jl +
src/inference/inference.jl:553): NaN/Inf objective checks on by default,
`None` disables, individual checks composable."""

import numpy as np
import pytest

import rxinfer_tpu as rx


def _inf_fe_model(n):
    """PointMass-like degenerate variance → Inf/NaN FE terms."""

    @rx.model
    def m(y):
        mu = rx.Normal(mean=0.0, var=100.0)
        for i in rx.plate(n):
            y[i] = rx.Normal(mean=mu, var=0.0)  # zero obs noise → Inf AE
        return {"mu": mu}

    return m


def test_default_checks_raise_on_nonfinite_fe():
    y = np.ones(5, np.float32) + np.linspace(0, 1, 5, dtype=np.float32)
    with pytest.raises(FloatingPointError, match="free_energy_diagnostics"):
        rx.infer(model=_inf_fe_model(len(y)), data={"y": y},
                 free_energy=True)


def test_none_disables_checks():
    y = np.ones(5, np.float32) + np.linspace(0, 1, 5, dtype=np.float32)
    res = rx.infer(model=_inf_fe_model(len(y)), data={"y": y},
                   free_energy=True, free_energy_diagnostics=None)
    assert not np.isfinite(np.asarray(res.free_energy)).all()


def test_single_check_composition():
    y = np.ones(5, np.float32)
    # the degenerate model yields NaN FE; an Infs-only check list must let it
    # through while the NaN check (default) errors — checks compose as tuples
    res = rx.infer(
        model=_inf_fe_model(len(y)), data={"y": y}, free_energy=True,
        free_energy_diagnostics=(rx.ObjectiveDiagnosticCheckInfs(),),
    )
    fe = np.asarray(res.free_energy)
    assert np.isnan(fe).any()
    with pytest.raises(FloatingPointError, match="NaN"):
        rx.infer(model=_inf_fe_model(len(y)), data={"y": y},
                 free_energy=True,
                 free_energy_diagnostics=(rx.ObjectiveDiagnosticCheckNaNs(),))


def test_finite_fe_passes_default_checks():
    y = np.ones(5, np.float32)

    @rx.model
    def m(y):
        mu = rx.Normal(mean=0.0, var=100.0)
        for i in rx.plate(len(y)):
            y[i] = rx.Normal(mean=mu, var=0.5)
        return {"mu": mu}

    res = rx.infer(model=m, data={"y": y}, free_energy=True)
    assert np.isfinite(np.asarray(res.free_energy)).all()
