"""Two-component Gaussian mixture clustering via VMP (BASELINE config 4)."""
import _common  # noqa: F401
import numpy as np

import rxinfer_tpu as rx
from rxinfer_tpu.dists import Dirichlet, GammaShapeRate, NormalMeanVariance

rng = np.random.default_rng(7)
n = 400
comp = rng.uniform(size=n) < 0.4
y = np.where(comp, 4.0 + 0.5 * rng.standard_normal(n),
             -1.0 + 0.7 * rng.standard_normal(n)).astype(np.float32)


@rx.model
def gmm(y):
    pi = rx.Dirichlet(np.ones(2, dtype=np.float32))
    m0 = rx.Normal(mean=-2.0, var=10.0)
    m1 = rx.Normal(mean=2.0, var=10.0)
    w0 = rx.Gamma(shape=1.0, rate=1.0)
    w1 = rx.Gamma(shape=1.0, rate=1.0)
    z = rx.latent(n, name="z")
    for i in rx.plate(n):
        z[i] = rx.Categorical(pi)
        y[i] = rx.NormalMixture(z[i], (m0, m1), (w0, w1))
    return {"pi": pi, "m0": m0, "m1": m1}


res = rx.infer(returnvars=rx.KeepLast(), 
    model=gmm, data={"y": y}, iterations=25,
    initialization={"m0": NormalMeanVariance(-2.0, 10.0),
                    "m1": NormalMeanVariance(2.0, 10.0),
                    "w0": GammaShapeRate(1.0, 1.0),
                    "w1": GammaShapeRate(1.0, 1.0),
                    "pi": rx.dists.Dirichlet(np.ones(2, np.float32))},
)
mus = sorted([float(res.posteriors["m0"].mean()), float(res.posteriors["m1"].mean())])
print(f"component means ~ {mus[0]:.2f}, {mus[1]:.2f} (true -1.0, 4.0)")
print(f"mixing weight ~ {np.asarray(res.posteriors['pi'].mean()).round(2)}")
