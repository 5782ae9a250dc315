"""Beta-Bernoulli coin flip — the reference's getting-started example."""
import _common  # noqa: F401
import numpy as np

import rxinfer_tpu as rx


@rx.model
def coin(y):
    theta = rx.Beta(4.0, 8.0)
    for i in rx.plate(len(y)):
        y[i] = rx.Bernoulli(theta)
    return {"theta": theta}


rng = np.random.default_rng(42)
y = (rng.uniform(size=500) < 0.75).astype(np.float32)
res = rx.infer(model=coin, data={"y": y}, free_energy=True)
q = res.posteriors["theta"]
print(f"posterior Beta({float(q.a):.1f}, {float(q.b):.1f}), "
      f"mean={float(q.mean()):.4f} (true 0.75)")
print(f"Bethe free energy (== -log evidence on this tree): "
      f"{float(np.asarray(res.free_energy)[-1]):.4f}")
