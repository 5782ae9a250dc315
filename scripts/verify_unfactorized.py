"""End-to-end verify on the real chip: UnfactorizedData structured predictions,
per-submodel default constraints, and chain goal-prior factors."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import rxinfer_tpu as rx
from rxinfer_tpu.dists import GammaShapeRate, PointMass

# ---- 1. UnfactorizedData + goal prior on a chain slot ---------------------------
goal = np.array([0.0, 0.0, 1.0, 0.0], dtype=np.float32)
a_eye = np.eye(4, dtype=np.float32)
p_s1 = np.array([0.7, 0.3, 0.0, 0.0], dtype=np.float32)


@rx.model
def pred_model(y):
    B = rx.DirichletCollection(np.ones((4, 4), dtype=np.float32))
    s = rx.latent(3, name="s")
    s[0] = rx.Categorical(p_s1)
    for t in rx.plate(1, 3):
        s[t] = rx.Transition(s[t - 1], B)
    for t in rx.plate(3):
        y[t] = rx.Transition(s[t], a_eye)
    rx.tie(s[2], rx.Categorical(goal))
    return {"s": s, "B": B}


y = np.full((3, 4), np.nan, dtype=np.float32)
y[0] = [1.0, 0.0, 0.0, 0.0]

res = rx.infer(
    model=pred_model,
    data={"y": rx.UnfactorizedData(y)},
    initialization={"B": rx.dists.DirichletCollection(
        np.ones((4, 4), dtype=np.float32))},
    iterations=10,
    free_energy=True,
    predictvars=["y"],
)
pred = np.asarray(res.predictions["y"].probs())[1]
ref = [0.25160378360439883, 0.20140807577024974,
       0.3455800648551016, 0.20140807577024974]
print("pred[1]      :", pred)
print("reference    :", np.asarray(ref, np.float32))
print("FE trace     :", np.asarray(res.free_energy))
assert np.allclose(pred, ref, atol=2e-4), "structured prediction mismatch"
assert np.isfinite(np.asarray(res.free_energy)).all()
print("[1/2] UnfactorizedData structured prediction OK on", pred.dtype)

# ---- 2. Default constraints on a @submodel --------------------------------------


@rx.submodel(default_constraints=rx.constraints(
    forms={"tau": rx.PointMassFormConstraint()}))
def gauss_block(y):
    mu = rx.Normal(mean=0.0, var=100.0)
    tau = rx.Gamma(shape=0.01, rate=0.01)
    for i in rx.plate(len(y)):
        y[i] = rx.Normal(mean=mu, precision=tau)


@rx.model
def two_blocks(y1, y2):
    gauss_block(y1)
    gauss_block(y2)


rng = np.random.default_rng(0)
res2 = rx.infer(
    model=two_blocks,
    data={"y1": (2.0 + 0.5 * rng.standard_normal(60)).astype(np.float32),
          "y2": (-1.0 + 2.0 * rng.standard_normal(60)).astype(np.float32)},
    iterations=15,
    free_energy=True,
    initialization={"gauss_block/tau": GammaShapeRate(1.0, 1.0),
                    "gauss_block:2/tau": GammaShapeRate(1.0, 1.0)},
)
assert isinstance(res2.posteriors["gauss_block/tau"], PointMass)
assert isinstance(res2.posteriors["gauss_block:2/tau"], PointMass)
mu1 = float(res2.posteriors["gauss_block/mu"].mean())
print("gauss_block/mu =", mu1, " tau(point) =",
      float(np.asarray(res2.posteriors["gauss_block/tau"].point)))
assert abs(mu1 - 2.0) < 0.3
print("[2/2] @submodel default constraints OK")
print("ALL VERIFIED on", __import__("jax").devices()[0])
