import numpy as np, jax, jax.numpy as jnp
import rxinfer_tpu as rx
from rxinfer_tpu.models import zoo
from rxinfer_tpu.dists import DirichletCollection
from bench import _median_time, _scalarize
from jax.scipy.special import digamma
from rxinfer_tpu.ops.pallas_discrete import fused_fb_batched

rng = np.random.default_rng(0)
BH, TH, IT_H = 256, 200, 20
a_true = np.array([[0.9,0.05,0.05],[0.05,0.9,0.05],[0.05,0.05,0.9]])
yh = np.zeros((BH, TH), np.int64)
for b in range(BH):
    s = rng.integers(3)
    for t in range(TH):
        s = rng.choice(3, p=a_true[:, s]); yh[b, t] = rng.choice(3, p=a_true[:, s])
yh1 = np.eye(3, dtype=np.float32)[yh]
init_h = {"A": DirichletCollection(np.full((3,3),1.0,np.float32)),
          "B": DirichletCollection(np.float32(np.eye(3)*5.0+1.0))}
_, prog = rx.batched_program(zoo.hmm(3,3), {"y": yh1}, iterations=IT_H,
                             free_energy=False, initialization=init_h)
yd = jnp.asarray(yh1)
t_eng = _median_time(_scalarize(lambda y: prog({"y": y})[0]), (yd,))
print("engine:", t_eng*1e3, "ms")

y_t = jnp.moveaxis(yd, 0, 1)
a0 = jnp.full((BH,3,3), 1.0)
b0 = jnp.asarray(np.broadcast_to(np.eye(3)*5.0+1.0,(BH,3,3)).astype(np.float32))
lp = jnp.zeros((BH,3))
def _elog(c): return digamma(c) - digamma(jnp.sum(c, axis=1, keepdims=True))
def fused(y_t):
    def body(_, carry):
        ca, cb = carry
        le = jnp.einsum("tbo,bok->tbk", y_t, _elog(cb))
        g, xi, _ = fused_fb_batched(lp, _elog(ca), le, chunk=32)
        return a0 + xi, b0 + jnp.einsum("tbo,tbk->bok", y_t, g)
    return jax.lax.fori_loop(0, IT_H, body, (a0, b0))
t_ops = _median_time(_scalarize(fused), (y_t,))
print("ops:", t_ops*1e3, "ms  ratio:", t_ops/t_eng)

# per-step-xi variant (what the engine uses)
def fused2(y_t):
    def body(_, carry):
        ca, cb = carry
        le = jnp.einsum("tbo,bok->tbk", y_t, _elog(cb))
        g, _, _, xis = fused_fb_batched(lp, _elog(ca), le, chunk=32, per_step_xi=True)
        return ca + jnp.sum(xis, axis=0), b0 + jnp.einsum("tbo,tbk->bok", y_t, g)
    return jax.lax.fori_loop(0, IT_H, body, (a0, b0))
t_ops2 = _median_time(_scalarize(fused2), (y_t,))
print("ops per-step-xi:", t_ops2*1e3, "ms")
