"""Verify round-2 hygiene changes at the library surface (real TPU)."""
import numpy as np
import rxinfer_tpu as rx
from rxinfer_tpu.dists import GammaShapeRate, NormalMeanVariance

@rx.model
def coin(y):
    theta = rx.Beta(2.0, 2.0)
    for i in rx.plate(len(y)):
        y[i] = rx.Bernoulli(theta)
    return {"theta": theta}

y = (np.random.default_rng(0).uniform(size=50) < 0.7).astype(np.float32)

# 1) trace_messages contextvar still records through infer on the real chip
with rx.trace_messages() as mt:
    res = rx.infer(model=coin, data={"y": y}, iterations=2, free_energy=True)
assert mt.records, "trace_messages recorded nothing"
assert rx.trace_messages._active.get() is None
print("theta mean:", float(res.posteriors["theta"].mean()),
      "FE:", [float(f) for f in res.free_energy])

# 2) compile cache hits on VALUE-equal (fresh) constraints objects
from rxinfer_tpu.inference import _COMPILE_CACHE
import rxinfer_tpu.inference as inf

@rx.model
def gauss(y):
    m = rx.Normal(mean=0.0, var=100.0)
    w = rx.Gamma(shape=1.0, rate=1.0)
    for i in rx.plate(len(y)):
        y[i] = rx.Normal(mean=m, precision=w)
    return {"m": m, "w": w}

yd = np.random.default_rng(1).normal(3.0, 1.0, 60).astype(np.float32)
init = {"w": GammaShapeRate(1.0, 1.0)}
c1 = rx.constraints(factorization=rx.MeanField())
c2 = rx.constraints(factorization=rx.MeanField())  # fresh, value-equal
r1 = rx.infer(model=gauss, data={"y": yd}, iterations=10, initialization=init,
              constraints=c1)
n_before = len(_COMPILE_CACHE)
r2 = rx.infer(model=gauss, data={"y": yd}, iterations=10, initialization=init,
              constraints=c2)
assert len(_COMPILE_CACHE) == n_before, "value-equal constraints recompiled!"
assert abs(float(r1.posteriors["m"].mean()) - float(r2.posteriors["m"].mean())) < 1e-6
print("cache value-keying OK; m:", float(r2.posteriors["m"].mean()))

# 3) showprogress prints a bar and completes
r3 = rx.infer(model=gauss, data={"y": yd}, iterations=5, initialization=init,
              showprogress=True)
print("showprogress OK")

# 4) misplaced options redirect with pointed error
try:
    rx.infer(model=gauss, data={"y": yd}, options={"annotations": True},
             initialization=init)
    raise SystemExit("expected ValueError for options annotations")
except ValueError as e:
    assert "top-level" in str(e), e
print("options redirect OK")

# 5) streaming autoupdates with closure-capture default (ADVICE medium):
#    lambda with a defaulted second param must get ONE arg (posteriors)
au = rx.autoupdates(
    initial={"a": 1.0, "b": 1.0},
    a=lambda q, bias=0.0: q["theta"].a + bias,
    b=lambda q, bias=0.0: q["theta"].b + bias,
)

@rx.model
def coin_stream(y, a, b):
    theta = rx.Beta(a, b)
    y.observe(rx.Bernoulli(theta))
    return {"theta": theta}

eng = rx.infer(model=coin_stream, datastream=[{"y": np.float32(1.0)},
                                              {"y": np.float32(0.0)},
                                              {"y": np.float32(1.0)}],
               autoupdates=au)
a_f, b_f = float(eng.args["a"]), float(eng.args["b"])
assert (a_f, b_f) == (3.0, 2.0), (a_f, b_f)
print("autoupdates defaulted-param arity OK:", a_f, b_f)
print("VERIFY PASS")
