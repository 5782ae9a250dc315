"""Multi-device scaling: DP-sharded chains + psum shared-parameter update on
an 8-device mesh (virtual CPU devices here; the same code runs on a pod slice)."""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import _common  # noqa: F401,E402  (forces CPU before backend init)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from rxinfer_tpu.parallel.hierarchical import (  # noqa: E402
    HierLGSSMState, make_sharded_step,
)

d, batch, t = 2, 16, 64
theta = np.pi / 30
f_mat = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]], np.float32)
h = np.eye(d, dtype=np.float32)
r = np.eye(d, dtype=np.float32)
m0 = np.zeros(d, np.float32)
p0 = 25.0 * np.eye(d, dtype=np.float32)

mesh = Mesh(np.asarray(jax.devices()[:8]), ("batch",))
nu0 = jnp.asarray(float(d) + 2.0)
s0_inv = jnp.eye(d, dtype=jnp.float32)
step = make_sharded_step(mesh, jnp.asarray(m0), jnp.asarray(p0),
                         jnp.asarray(f_mat), jnp.asarray(h), jnp.asarray(r),
                         nu0, s0_inv)
rng = np.random.default_rng(0)
y = rng.standard_normal((batch, t, d)).astype(np.float32)
y = jax.device_put(y, NamedSharding(mesh, P("batch")))
state = HierLGSSMState(nu0 + 0.0, s0_inv + 0.0)
for _ in range(5):
    state, (means, covs) = step(state, y)
print(f"{len(mesh.devices.flat)} devices; shared process-noise dof "
      f"after 5 sweeps: {float(state.w_nu):.1f}")
print("smoothed means sharded as:", means.sharding.spec)
