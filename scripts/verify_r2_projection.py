"""Verify manifold projection + form constraints on the REAL TPU."""
import numpy as np
import rxinfer_tpu as rx
from rxinfer_tpu.dists import Beta as BD, GammaShapeRate, PointMass

rng = np.random.default_rng(0)
n = 60
y = (0.7 + np.sqrt(0.05) * rng.standard_normal(n)).astype(np.float32)

@rx.model
def m(y):
    theta = rx.Beta(2.0, 2.0)
    for i in rx.plate(n):
        y[i] = rx.Normal(mean=theta, var=0.05)
    return {"theta": theta}

cs = rx.constraints(forms={"theta": rx.ProjectedTo("beta", n_samples=2048)})
res = rx.infer(model=m, data={"y": y}, iterations=6, constraints=cs,
               initialization={"theta": BD(2.0, 2.0)})
q = res.posteriors["theta"]
print("projected beta:", float(q.a), float(q.b), "mean:", float(q.mean()))
assert 0.6 < float(q.mean()) < 0.8

cs2 = rx.constraints(forms={"theta": rx.PointMassFormConstraint(
    starting_point=np.float32(0.5), boundaries=(1e-3, 1-1e-3))})
res2 = rx.infer(model=m, data={"y": y}, iterations=4, constraints=cs2,
                initialization={"theta": BD(2.0, 2.0)})
assert isinstance(res2.posteriors["theta"], PointMass)
print("MAP:", float(res2.posteriors["theta"].point))
print("VERIFY PASS")
