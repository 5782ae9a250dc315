"""Round-4 milestone 2 verify (real chip): known-inverse delta, custom-
transition structured FE, mixture FE, batched annotations, shared pooling,
strict-precision option — the library surface end-to-end."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

import rxinfer_tpu as rx
from rxinfer_tpu.dists import Beta as BD, GammaShapeRate, NormalMeanVariance

# 1. known-inverse delta (contracted path) on the real chip
rng = np.random.default_rng(0)
y1 = (np.exp(0.8) + 0.1 * rng.standard_normal(40)).astype(np.float32)


@rx.model
def m1(y):
    theta = rx.Normal(mean=0.0, var=2.0)
    for i in rx.plate(len(y)):
        y[i] = rx.Normal(mean=rx.Delta(jnp.exp, theta, inverse=jnp.log),
                         var=0.01)
    return {"theta": theta}


r1 = rx.infer(model=m1, data={"y": y1}, iterations=15,
              returnvars=rx.KeepLast(),
              initialization={"theta": NormalMeanVariance(0.5, 1.0)})
assert abs(float(r1.posteriors["theta"].mean()) - 0.8) < 0.05
print("1. known-inverse delta OK", flush=True)

# 2. mixture FE == -logZ + batched annotations
yb = (rng.uniform(size=(3, 8)) < 0.6).astype(np.float32)


@rx.model
def coin(y):
    p = rx.Beta(2.0, 2.0)
    for i in rx.plate(y.shape[-1] if hasattr(y, "shape") else 8):
        y[i] = rx.Bernoulli(p)
    return {"p": p}


res_b = rx.infer_batched(coin, data={"y": yb}, iterations=2,
                         annotations=rx.LogScaleAnnotations(),
                         returnvars=rx.KeepLast())
ls = np.asarray(rx.getlogscale(res_b.posteriors["p"]))
assert ls.shape == (3,) and np.isfinite(ls).all()
print("2. batched LogScale annotations OK:", ls, flush=True)

# 3. shared-parameter pooling (single chip, no mesh)
Y = np.cumsum(rng.standard_normal((4, 32)), axis=1).astype(np.float32)


@rx.model
def walk(y):
    T = len(y)
    tau = rx.Gamma(shape=2.0, rate=2.0)
    x = rx.latent(T, name="x")
    x[0] = rx.Normal(mean=0.0, var=100.0)
    for t in rx.plate(1, T):
        x[t] = rx.Normal(mean=x[t - 1], var=0.25)
    for t in rx.plate(T):
        y[t] = rx.Normal(mean=x[t], precision=tau)
    return {"x": x, "tau": tau}


posts, fe = rx.infer_batched(walk, data={"y": Y}, iterations=4,
                             shared=("tau",), free_energy=True,
                             initialization={"tau": GammaShapeRate(2.0, 2.0)})
tm = np.asarray(posts["tau"].mean())
assert np.allclose(tm, tm[0], rtol=1e-5) and np.asarray(fe).shape == (4,)
print("3. shared pooling OK: tau =", float(tm[0]), flush=True)

# 4. strict-precision option accepted on chip
r4 = rx.infer(model=m1, data={"y": y1}, iterations=3,
              returnvars=rx.KeepLast(),
              options={"matmul_precision": "highest"},
              initialization={"theta": NormalMeanVariance(0.5, 1.0)})
assert np.isfinite(float(r4.posteriors["theta"].mean()))
print("4. strict-fp32 mode OK", flush=True)

print("VERIFY PASS")
