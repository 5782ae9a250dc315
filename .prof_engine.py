import numpy as np, jax, jax.numpy as jnp, time
import rxinfer_tpu as rx
from rxinfer_tpu.models import zoo
from bench import _median_time, _scalarize

d, T, B2 = 4, 10_000, 1024
theta = np.pi / 40
rot = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]], np.float32)
f_mat = np.kron(np.eye(2, dtype=np.float32), rot)
q = 0.1 * np.eye(d, dtype=np.float32)
h = np.eye(d, dtype=np.float32)
r = 0.5 * np.eye(d, dtype=np.float32)
m0 = np.zeros(d, np.float32)
p0 = 5.0 * np.eye(d, dtype=np.float32)

gen = zoo.lgssm(f_mat, q, h, r, m0, p0)
y2 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(1), (B2, T, d)))()
jax.block_until_ready(y2)

compiled, eng_prog = rx.batched_program(gen, {"y": np.zeros((B2, T, d), np.float32)}, iterations=1, free_energy=False)
eng = _scalarize(lambda ys: eng_prog({"y": ys})[0])
t_eng = _median_time(eng, (y2,))
print("engine:", t_eng * 1e3, "ms")

# xi assembly alone
from rxinfer_tpu.engine.batched import build_plans
plans = build_plans(compiled, {"y": np.zeros((T, d), np.float32)})
block = [b for k, b in compiled.blocks if k == "chain"][0]
def xi_only(data):
    def xi_of(dd):
        xi, _ = block._evidence({}, dd, {}, T)
        return xi
    return jax.vmap(xi_of, out_axes=1)({"y": data})
xi_fn = _scalarize(lambda ys: xi_only(ys))
t_xi = _median_time(jax.jit(xi_fn), (y2,))
print("xi assembly:", t_xi * 1e3, "ms")

# kernel alone with pre-staged xi
from rxinfer_tpu.ops.pallas_smoother import fused_batched_smoother
plan = plans["x"]
xi_t = jax.jit(lambda ys: xi_only(ys))(y2)
jax.block_until_ready(xi_t)
m0b = jnp.zeros((B2, d)); p0b = jnp.broadcast_to(jnp.asarray(p0), (B2, d, d))
k_fn = _scalarize(lambda m0x: fused_batched_smoother(m0x, p0b, xi_t, plan.A, plan.b, plan.Q, plan.W, chunk=8)[:2])
t_k = _median_time(k_fn, (m0b,))
print("kernel (pre-staged xi):", t_k * 1e3, "ms")

# kernel + moveaxis outputs (engine's final layout)
k2 = _scalarize(lambda m0x: tuple(jnp.moveaxis(o, 0, 1) for o in fused_batched_smoother(m0x, p0b, xi_t, plan.A, plan.b, plan.Q, plan.W, chunk=8)[:2]))
t_k2 = _median_time(k2, (m0b,))
print("kernel + output transpose:", t_k2 * 1e3, "ms")
