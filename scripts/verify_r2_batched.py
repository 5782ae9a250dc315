"""Verify batched engine + streaming kwargs on the REAL TPU chip."""
import numpy as np
import rxinfer_tpu as rx
from rxinfer_tpu.models import zoo
from rxinfer_tpu.dists import DirichletCollection, GammaShapeRate

# 1) infer_batched LGSSM: fused kernel on real chip, matches per-dataset infer
d = 2
A = np.array([[0.996, -0.09], [0.09, 0.996]], np.float32)
Q = np.eye(d, dtype=np.float32); H = 1.3*np.eye(d, dtype=np.float32)
R = np.eye(d, dtype=np.float32)
gen = zoo.lgssm(A, Q, H, R, np.zeros(d, np.float32), 25*np.eye(d, dtype=np.float32))
rng = np.random.default_rng(0)
B, T = 4, 50
y = rng.standard_normal((B, T, d)).astype(np.float32)
posts, fe = rx.infer_batched(gen, {"y": y}, iterations=1, free_energy=True)
ref = rx.infer(model=gen, data={"y": y[2]}, iterations=1, free_energy=True)
err = np.abs(np.asarray(posts["x"].mean())[2] - np.asarray(ref.posteriors["x"].mean())).max()
fe_err = abs(float(fe[-1, 2]) - float(ref.free_energy[-1]))
print("batched LGSSM on TPU: mean err", err, "fe err", fe_err)
assert err < 2e-2 and fe_err < 0.5  # fp32 cross-path agreement on TPU (f64-oracle anchors live in bench.py)

# 2) batched HMM on real chip (fused discrete kernel with per-step xis)
gen_h = zoo.hmm(3, 3)
yh = np.eye(3, dtype=np.float32)[rng.integers(0, 3, (3, 30))]
init_h = {"A": DirichletCollection(np.full((3, 3), 1.0, np.float32)),
          "B": DirichletCollection(np.float32(np.eye(3)*5.0+1.0))}
ph, feh = rx.infer_batched(gen_h, {"y": yh}, iterations=4, free_energy=True,
                           initialization=init_h)
rh = rx.infer(model=gen_h, data={"y": yh[1]}, iterations=4, free_energy=True,
              initialization=init_h)
gerr = np.abs(np.asarray(ph["A"].alpha)[1] - np.asarray(rh.posteriors["A"].alpha)).max()
print("batched HMM on TPU: A alpha err", gerr)
assert gerr < 1e-3

# 3) streaming with callbacks (host-loop) + historyvars on real chip
@rx.model
def step(y, pm, pv):
    x = rx.Normal(mean=pm, var=pv)
    tau = rx.Gamma(shape=2.0, rate=2.0)
    y.observe(rx.Normal(mean=x, precision=tau))
    return {"x": x, "tau": tau}

au = rx.autoupdates(initial={"pm": 0.0, "pv": 10.0},
                    pm=lambda q: q["x"].mean(), pv=lambda q: q["x"].var())
seen = []
eng = rx.infer(model=step, datastream=[{"y": np.float32(v)} for v in (1.0, 0.8, 1.2)],
               autoupdates=au, iterations=3, free_energy=True,
               initialization={"tau": GammaShapeRate(2.0, 2.0)},
               keephistory=2, historyvars={"x": rx.KeepEach()},
               callbacks={"after_iteration": lambda ev: seen.append(ev.payload["iteration"])},
               benchmark=True)
assert seen == [0, 1, 2]*3, seen
assert len(eng.history) == 2 and len(eng.history[-1]["x"]) == 3
print("streaming host-loop on TPU: x ->", float(eng.posteriors["x"].mean()))
print("VERIFY PASS")
