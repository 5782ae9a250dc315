"""Verify on the real chip: fused Pallas streaming filter vs scan path at the
library surface, plus a standard batch infer() smoke with free energy."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

import rxinfer_tpu as rx
from rxinfer_tpu.parallel.filtering import FilterState, filtering_scan
from rxinfer_tpu.ops.pallas_filter import fused_filtering_scan

d, B, T = 4, 3000, 100
rng = np.random.default_rng(7)
th = np.pi / 35
rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]], np.float32)
f = np.kron(np.eye(d // 2, dtype=np.float32), rot)
q = np.eye(d, dtype=np.float32); h = 1.3 * np.eye(d, dtype=np.float32)
r = np.eye(d, dtype=np.float32)
ys = jnp.asarray(rng.standard_normal((T, B, d)).astype(np.float32))
st = FilterState(jnp.zeros((B, d)),
                 jnp.broadcast_to(25.0 * jnp.eye(d, dtype=jnp.float32), (B, d, d)))
rf, rm = filtering_scan(st, ys, jnp.asarray(f), jnp.asarray(q), jnp.asarray(h), jnp.asarray(r))
of, om = fused_filtering_scan(st, ys, jnp.asarray(f), jnp.asarray(q), jnp.asarray(h), jnp.asarray(r), chunk=8)
dm = float(jnp.max(jnp.abs(om - rm))); dp = float(jnp.max(jnp.abs(of.p - rf.p)))
print(f"fused-vs-scan  max|dm|={dm:.3g}  max|dP|={dp:.3g}")
assert dm < 1e-4 and dp < 1e-4

# library-surface smoke: LGSSM infer() with FE on the real chip
m0 = np.zeros(2, np.float32); v0 = 25.0 * np.eye(2, dtype=np.float32)
A = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]], np.float32)
Q = 0.1 * np.eye(2, dtype=np.float32); R = np.eye(2, dtype=np.float32)
yobs = rng.standard_normal((200, 2)).astype(np.float32)

@rx.model
def lgssm(y):
    Tn = len(y)
    x = rx.latent(Tn, name="x")
    x[0] = rx.MvNormal(mean=m0, cov=v0)
    for t in rx.plate(1, Tn):
        x[t] = rx.MvNormal(mean=A @ x[t - 1], cov=Q)
    for t in rx.plate(Tn):
        y[t] = rx.MvNormal(mean=x[t], cov=R)

res = rx.infer(model=lgssm, data={"y": yobs}, free_energy=True)
fe = float(np.asarray(res.free_energy[-1]))
xm = np.asarray(res.posteriors["x"].mean())
print(f"infer() FE={fe:.4f}  x mean shape={xm.shape}  finite={np.isfinite(xm).all()}")
assert np.isfinite(fe) and np.isfinite(xm).all()
print("VERIFY OK")
