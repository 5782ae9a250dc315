"""Gaussian with unknown mean AND precision — conjugate VMP with iterations
(reference: getting-started variational example)."""
import _common  # noqa: F401
import numpy as np

import rxinfer_tpu as rx
from rxinfer_tpu.dists import GammaShapeRate

rng = np.random.default_rng(1)
y = (3.0 + 0.5 * rng.standard_normal(300)).astype(np.float32)


@rx.model
def gauss(y):
    mu = rx.Normal(mean=0.0, var=100.0)
    tau = rx.Gamma(shape=0.01, rate=0.01)
    for i in rx.plate(len(y)):
        y[i] = rx.Normal(mean=mu, precision=tau)
    return {"mu": mu, "tau": tau}


res = rx.infer(returnvars=rx.KeepLast(), model=gauss, data={"y": y}, iterations=20,
               initialization={"tau": GammaShapeRate(0.01, 0.01)},
               free_energy=True)
fe = np.asarray(res.free_energy)
print(f"mu ~ {float(res.posteriors['mu'].mean()):.3f} (true 3.0); "
      f"precision ~ {float(res.posteriors['tau'].mean()):.2f} (true 4.0)")
print(f"free energy decreased monotonically: {bool((np.diff(fe) <= 1e-5 * abs(fe[0])).all())}")
