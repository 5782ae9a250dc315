"""Objective (free-energy) diagnostic checks — reference
src/score/diagnostics.jl: ``DefaultObjectiveDiagnosticChecks`` guards the FE
stream against NaN/Inf and is user-configurable via the
``free_energy_diagnostics`` keyword of ``infer`` (``None`` disables all
checks, src/inference/inference.jl:553)."""

from __future__ import annotations

import numpy as np


class ObjectiveDiagnosticCheckNaNs:
    """Error when the objective (Bethe FE) evaluates to NaN
    (reference ObjectiveDiagnosticCheckNaNs, src/score/diagnostics.jl:14)."""

    def __repr__(self):
        return "ObjectiveDiagnosticCheckNaNs()"


class ObjectiveDiagnosticCheckInfs:
    """Error when the objective (Bethe FE) evaluates to Inf
    (reference ObjectiveDiagnosticCheckInfs, src/score/diagnostics.jl:37)."""

    def __repr__(self):
        return "ObjectiveDiagnosticCheckInfs()"


DefaultObjectiveDiagnosticChecks = (
    ObjectiveDiagnosticCheckNaNs(),
    ObjectiveDiagnosticCheckInfs(),
)


def apply_fe_diagnostics(checks, fe_array) -> None:
    """Host-side check of a computed FE trace against the configured
    diagnostics (the static-schedule analogue of the reference's
    ``apply_diagnostic_check`` stream guards)."""
    if checks is None:
        return
    if not isinstance(checks, (tuple, list)):
        checks = (checks,)
    fe = np.asarray(fe_array)
    if fe.size == 0:
        return
    for check in checks:
        if isinstance(check, ObjectiveDiagnosticCheckNaNs) and np.isnan(fe).any():
            raise FloatingPointError(
                "Failed to compute the final objective value. The result is "
                "`NaN`. Use the `free_energy_diagnostics` keyword argument "
                "in `infer` to suppress this error (reference: "
                "src/score/diagnostics.jl)."
            )
        if isinstance(check, ObjectiveDiagnosticCheckInfs) and np.isinf(fe).any():
            raise FloatingPointError(
                "Failed to compute the final objective value. The result is "
                "`Inf`. Use the `free_energy_diagnostics` keyword argument "
                "in `infer` to suppress this error (reference: "
                "src/score/diagnostics.jl)."
            )
