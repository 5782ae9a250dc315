"""Latent autoregressive process — univariate regime (reference:
test/models/autoregressive/lar_tests.jl, ARMeta(Univariate, ...)).

Learns the AR coefficient, innovation precision, and the latent path jointly
by structured VMP; the AR chain itself is solved exactly per sweep by the
associative-scan Kalman block."""
import _common  # noqa: F401
import numpy as np

import rxinfer_tpu as rx
from rxinfer_tpu.dists import GammaShapeRate, NormalMeanVariance

rng = np.random.default_rng(0)
T = 300
theta_true = 0.8
x = np.zeros(T)
for t in range(1, T):
    x[t] = theta_true * x[t - 1] + rng.standard_normal()
y = (x + 0.3 * rng.standard_normal(T)).astype(np.float32)


@rx.model
def ar1(y):
    theta = rx.Normal(mean=0.0, precision=1.0)
    gamma = rx.Gamma(shape=1.0, rate=1.0)
    s = rx.latent(T, name="s")
    s[0] = rx.Normal(mean=0.0, precision=1.0)
    for t in rx.plate(1, T):
        s[t] = rx.AR(s[t - 1], theta, gamma, order=1)
    for t in rx.plate(T):
        y[t] = rx.Normal(mean=s[t], var=0.09)
    return {"theta": theta, "gamma": gamma, "s": s}


res = rx.infer(
    model=ar1, data={"y": y}, iterations=30, returnvars=rx.KeepLast(),
    free_energy=True,
    initialization={"theta": NormalMeanVariance(0.0, 1.0),
                    "gamma": GammaShapeRate(1.0, 1.0)},
)
th = res.posteriors["theta"]
print(f"theta ~ {float(th.mean()):.3f} +- {float(th.var()) ** 0.5:.3f} "
      f"(true {theta_true})")
print(f"gamma ~ {float(res.posteriors['gamma'].mean()):.3f} (true 1.0)")
fe = np.asarray(res.free_energy)
print(f"free energy decreased monotonically: {bool((np.diff(fe) <= 1e-3).all())}")
