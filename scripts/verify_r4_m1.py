"""Round-4 milestone 1 verify: data-folded infer_batched + time-sharded infer.

Run on the REAL chip (plain python from /root/repo): exercises the user
surface end-to-end. The time-mesh path uses a 1-device mesh on the real chip
(the 8-device case is covered by the CPU-mesh tests + dryrun)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
from jax.sharding import Mesh

import rxinfer_tpu as rx

# --- 1. infer_batched with folded data expressions (advisor medium fix) ---


@rx.model
def folded(y, a, b):
    x = rx.Normal(mean=a + b, precision=1.0)
    y.observe(rx.Normal(mean=x, var=1.0))
    return {"x": x}


a = np.array([2.0, -1.0, 0.5, 3.0], np.float32)
b = np.array([2.0, 1.0, 0.5, -1.0], np.float32)
y = np.zeros(4, np.float32)
posts, fe = rx.infer_batched(folded, data={"a": a, "b": b, "y": y},
                             free_energy=True)
means = np.asarray(posts["x"].mean())
np.testing.assert_allclose(means, (a + b) / 2.0, atol=1e-3)
print("1. infer_batched data folding OK:", means, flush=True)

# --- 2. time-sharded rx.infer on a device mesh ---

rng = np.random.default_rng(0)
T = 256
xs = np.cumsum(rng.standard_normal((T, 2)), axis=0).astype(np.float32)
obs = (xs + 0.5 * rng.standard_normal((T, 2))).astype(np.float32)


@rx.model
def lgssm(y):
    T = len(y)
    x = rx.latent(T, name="x")
    x[0] = rx.MvNormal(mean=np.zeros(2, np.float32),
                       cov=25.0 * np.eye(2, dtype=np.float32))
    for t in rx.plate(1, T):
        x[t] = rx.MvNormal(mean=x[t - 1], cov=np.eye(2, dtype=np.float32))
    for t in rx.plate(T):
        y[t] = rx.MvNormal(mean=x[t], cov=0.25 * np.eye(2, dtype=np.float32))


ref = rx.infer(model=lgssm, data={"y": obs}, free_energy=True,
               returnvars=rx.KeepLast())
mesh = Mesh(np.asarray(jax.devices()[:1]), ("time",))
res = rx.infer(model=lgssm, data={"y": obs}, free_energy=True,
               returnvars=rx.KeepLast(), mesh=mesh)
np.testing.assert_allclose(np.asarray(res.posteriors["x"].mean()),
                           np.asarray(ref.posteriors["x"].mean()),
                           rtol=5e-3, atol=5e-3)
fe_ref = float(np.asarray(ref.free_energy)[-1])
fe_sh = float(np.asarray(res.free_energy)[-1])
assert abs(fe_sh - fe_ref) < 1e-2 * abs(fe_ref), (fe_sh, fe_ref)
print(f"2. time-sharded infer OK: FE {fe_sh:.3f} vs {fe_ref:.3f}",
      flush=True)

# --- 3. mesh error path wording ---
try:
    rx.infer_batched(folded, data={"a": a[:3], "b": b[:3], "y": y[:3]},
                     mesh=Mesh(np.asarray(jax.devices()[:2]), ("dp",)))
    raise AssertionError("expected ValueError")
except ValueError as e:
    assert "divisible by" in str(e), e
    print("3. mesh divisibility error message OK")
except Exception as e:  # 1-device envs: only 1 real chip — skip
    print("3. skipped (needs 2 devices):", type(e).__name__)

print("VERIFY PASS")
