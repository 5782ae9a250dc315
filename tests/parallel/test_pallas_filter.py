"""Fused Pallas streaming filter == lax.scan filter (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from rxinfer_tpu.ops.pallas_filter import fused_filtering_scan
from rxinfer_tpu.parallel.filtering import FilterState, filtering_scan


def _setup(b, d, t, seed=0):
    rng = np.random.default_rng(seed)
    theta = np.pi / 30
    rot = np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]],
        np.float32,
    )
    f = np.kron(np.eye(d // 2, dtype=np.float32), rot) if d % 2 == 0 else \
        np.eye(d, dtype=np.float32) * 0.9
    q = 0.3 * np.eye(d, dtype=np.float32)
    h = 1.2 * np.eye(d, dtype=np.float32)
    r = 0.8 * np.eye(d, dtype=np.float32)
    ys = rng.standard_normal((t, b, d)).astype(np.float32)
    state = FilterState(
        jnp.asarray(rng.standard_normal((b, d)).astype(np.float32)),
        jnp.broadcast_to(5.0 * jnp.eye(d, dtype=jnp.float32), (b, d, d)),
    )
    return state, jnp.asarray(ys), jnp.asarray(f), jnp.asarray(q), \
        jnp.asarray(h), jnp.asarray(r)


def test_fused_filter_matches_scan_d4():
    state, ys, f, q, h, r = _setup(b=7, d=4, t=37)  # odd B/T: padding paths
    ref_final, ref_means = filtering_scan(state, ys, f, q, h, r)
    out_final, out_means = fused_filtering_scan(
        state, ys, f, q, h, r, chunk=8, interpret=True
    )
    np.testing.assert_allclose(out_means, ref_means, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(out_final.m, ref_final.m, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(out_final.p, ref_final.p, rtol=2e-4, atol=2e-4)


def test_fused_filter_matches_scan_d2_chunk_aligned():
    state, ys, f, q, h, r = _setup(b=16, d=2, t=32, seed=1)
    ref_final, ref_means = filtering_scan(state, ys, f, q, h, r)
    out_final, out_means = fused_filtering_scan(
        state, ys, f, q, h, r, chunk=16, interpret=True
    )
    np.testing.assert_allclose(out_means, ref_means, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(out_final.p, ref_final.p, rtol=2e-4, atol=2e-4)


def test_sharded_fused_filter_on_cpu_mesh():
    """fused kernel inside shard_map over the 8-device CPU mesh (interpret)."""
    import jax
    from jax.sharding import Mesh

    from rxinfer_tpu.parallel.filtering import make_sharded_filtering

    state, ys, f, q, h, r = _setup(b=16, d=4, t=24, seed=3)
    mesh = Mesh(np.array(jax.devices()[:8]), ("batch",))
    with mesh:
        fn = make_sharded_filtering(mesh, f, q, h, r, fused=True,
                                    interpret=True, chunk=8)
        out_final, out_means = fn(state, ys)
    ref_final, ref_means = filtering_scan(state, ys, f, q, h, r)
    np.testing.assert_allclose(out_means, ref_means, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(out_final.p, ref_final.p, rtol=2e-4, atol=2e-4)
