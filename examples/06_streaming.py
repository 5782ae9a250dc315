"""Streaming filtering with posteriors->priors feedback (@autoupdates)."""
import _common  # noqa: F401
import numpy as np

import rxinfer_tpu as rx

rng = np.random.default_rng(5)
true_x = np.cumsum(0.1 * rng.standard_normal(100)).astype(np.float32) + 2.0
obs = (true_x + 0.5 * rng.standard_normal(100)).astype(np.float32)


@rx.model
def step(y, pm, pv):
    x = rx.Normal(mean=pm, var=pv)
    y.observe(rx.Normal(mean=x, var=0.25))
    return {"x": x}


au = rx.autoupdates(
    initial={"pm": 0.0, "pv": 100.0},
    pm=lambda q: q["x"].mean(),
    pv=lambda q: q["x"].var() + 0.01,   # random-walk prediction
)
engine = rx.infer(model=step, datastream=({"y": v} for v in obs),
                  autoupdates=au, keephistory=100)
est = np.array([float(h["x"].mean()) for h in engine.history])
print(f"filter RMSE {float(np.sqrt(((est - true_x) ** 2).mean())):.3f} "
      f"(obs noise sd 0.5)")
# offline fast path: the same loop as ONE lax.scan on device
engine2 = rx.infer(model=step, datastream=None, autoupdates=rx.autoupdates(
    initial={"pm": 0.0, "pv": 100.0},
    pm=lambda q: q["x"].mean(), pv=lambda q: q["x"].var() + 0.01))
posts, _ = engine2.run_offline({"y": obs})
print("offline scan matches:", bool(abs(float(engine2.args["pm"]) - est[-1]) < 1e-3))
