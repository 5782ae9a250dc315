"""ContinuousTransition: learning a random transition operator
(reference CTransition node tests)."""

import numpy as np

import rxinfer_tpu as rx
from rxinfer_tpu.dists import MvNormalMeanCovariance


def test_learn_emission_operator():
    """y_i = A x_i + noise with known inputs x (as data), learn vec(A)."""
    rng = np.random.default_rng(0)
    dy, dx, n = 2, 3, 400
    a_true = rng.standard_normal((dy, dx)).astype(np.float32)
    x = rng.standard_normal((n, dx)).astype(np.float32)
    y = (x @ a_true.T + 0.1 * rng.standard_normal((n, dy))).astype(np.float32)
    w = np.float32(np.eye(dy) / 0.01)

    @rx.model
    def m(x, y):
        theta = rx.MvNormal(mean=np.zeros(dy * dx, np.float32),
                            cov=10.0 * np.eye(dy * dx, dtype=np.float32))
        for i in rx.plate(n):
            y[i] = rx.ContinuousTransition(x[i], theta, w)
        return {"theta": theta}

    res = rx.infer(returnvars=rx.KeepLast(), 
        model=m, data={"x": x, "y": y}, iterations=5,
        initialization={
            "theta": MvNormalMeanCovariance(
                np.zeros(dy * dx, np.float32), np.eye(dy * dx, dtype=np.float32)
            )
        },
        free_energy=True,
    )
    a_est = np.asarray(res.posteriors["theta"].mean()).reshape(dy, dx)
    np.testing.assert_allclose(a_est, a_true, atol=0.05)
    assert np.isfinite(np.asarray(res.free_energy)).all()
