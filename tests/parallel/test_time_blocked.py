"""Time-blocked distributed smoother vs single-device smoother (exactness on
the 8-device CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rxinfer_tpu.ops.kalman import ChainParams, sequential_smoother
from rxinfer_tpu.parallel.time_blocked import make_time_blocked_smoother


def test_time_blocked_matches_single_device():
    T, d = 256, 3
    rng = np.random.default_rng(0)
    theta = 0.2
    rot = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    f = np.eye(d, dtype=np.float32)
    f[:2, :2] = rot
    F = np.tile(f, (T - 1, 1, 1)).astype(np.float32)
    b = 0.1 * rng.standard_normal((T - 1, d)).astype(np.float32)
    Q = np.tile(np.eye(d, dtype=np.float32), (T - 1, 1, 1))
    y = rng.standard_normal((T, d)).astype(np.float32)
    W = np.tile(0.8 * np.eye(d, dtype=np.float32), (T, 1, 1))
    xi = (0.8 * y).astype(np.float32)
    m0 = np.zeros(d, np.float32)
    P0 = 10 * np.eye(d, dtype=np.float32)

    # oracle
    params = ChainParams(*[jnp.asarray(a) for a in (m0, P0, F, b, Q, xi, W)])
    oracle = sequential_smoother(params)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("time",))
    fn = make_time_blocked_smoother(mesh, d)
    sh = NamedSharding(mesh, P("time"))
    put = lambda a: jax.device_put(jnp.asarray(a), sh)
    rep = lambda a: jax.device_put(jnp.asarray(a), NamedSharding(mesh, P()))
    # pad transition arrays to T inside smoother; shard the T-length arrays
    means, covs, fm, fc, cross = fn(
        rep(m0), rep(P0),
        put(F) if False else jnp.asarray(F), jnp.asarray(b), jnp.asarray(Q),
        put(xi), put(W),
    )
    np.testing.assert_allclose(means, oracle.means, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(covs, oracle.covs, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(fm, oracle.filt_means, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(cross, oracle.cross, rtol=5e-3, atol=5e-3)
