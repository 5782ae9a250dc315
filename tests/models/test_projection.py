"""Non-conjugate inference via ProjectedTo (reference: ProjectionExt +
docs/src/manuals/inference/nonconjugate.md)."""

import numpy as np
from scipy import integrate
from scipy.stats import beta as sp_beta, norm as sp_norm

import rxinfer_tpu as rx
from rxinfer_tpu.dists import Beta as BetaDist


def test_beta_prior_gaussian_likelihood():
    """theta ~ Beta(2,2); y_i ~ N(theta, 0.05) — non-conjugate product projected
    back onto the Beta manifold."""
    rng = np.random.default_rng(0)
    theta_true = 0.7
    n = 60
    y = (theta_true + np.sqrt(0.05) * rng.standard_normal(n)).astype(np.float32)

    @rx.model
    def m(y):
        theta = rx.Beta(2.0, 2.0)
        for i in rx.plate(n):
            y[i] = rx.Normal(mean=theta, var=0.05)
        return {"theta": theta}

    cs = rx.constraints(forms={"theta": rx.ProjectedTo("beta", n_samples=4096)})
    res = rx.infer(returnvars=rx.KeepLast(), 
        model=m, data={"y": y}, iterations=8, constraints=cs,
        initialization={"theta": BetaDist(2.0, 2.0)},
    )
    q = res.posteriors["theta"]
    assert isinstance(q, BetaDist)

    # quadrature ground truth on (0,1)
    def unnorm(t):
        return sp_beta(2, 2).pdf(t) * np.exp(
            np.sum(sp_norm(t, np.sqrt(0.05)).logpdf(y[:, None]), axis=0)
        )

    ts = np.linspace(1e-4, 1 - 1e-4, 4001)
    w = unnorm(ts)
    w /= integrate.trapezoid(w, ts)
    mean_exact = integrate.trapezoid(ts * w, ts)
    var_exact = integrate.trapezoid((ts - mean_exact) ** 2 * w, ts)

    assert abs(float(q.mean()) - mean_exact) < 0.02, (float(q.mean()), mean_exact)
    assert abs(float(q.var()) - var_exact) < 0.5 * var_exact + 1e-4
