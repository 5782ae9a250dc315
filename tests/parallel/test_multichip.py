"""Multi-chip paths on the 8-device virtual CPU mesh (SURVEY.md §4: DP/collective
paths testable without TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rxinfer_tpu.parallel.hierarchical import HierLGSSMState, make_sharded_step
from rxinfer_tpu.parallel.filtering import FilterState, make_sharded_filtering


def _params(d=2):
    theta = np.pi / 20
    f = np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]],
        dtype=np.float32,
    )
    h = np.eye(d, dtype=np.float32)
    r = np.eye(d, dtype=np.float32)
    q = 0.5 * np.eye(d, dtype=np.float32)
    return f, h, r, q


def test_dryrun_entrypoints():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ge.dryrun_multichip(8)


def test_sharded_hier_step_matches_single_device():
    d = 2
    f, h, r, _ = _params(d)
    m0 = np.zeros(d, np.float32)
    p0 = 10 * np.eye(d, dtype=np.float32)
    nu0 = jnp.asarray(4.0)
    s0_inv = jnp.eye(d, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    y = rng.standard_normal((16, 24, d)).astype(np.float32)

    mesh8 = Mesh(np.asarray(jax.devices()[:8]), ("batch",))
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("batch",))

    outs = []
    for mesh in (mesh8, mesh1):
        step = make_sharded_step(
            mesh, jnp.asarray(m0), jnp.asarray(p0), jnp.asarray(f),
            jnp.asarray(h), jnp.asarray(r), nu0, s0_inv,
        )
        state = HierLGSSMState(nu0 + 0.0, s0_inv + 0.0)
        ys = jax.device_put(y, NamedSharding(mesh, P("batch")))
        st, (means, _) = step(state, ys)
        outs.append((np.asarray(st.w_nu), np.asarray(st.w_sinv), np.asarray(means)))

    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-5)
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(outs[0][2], outs[1][2], rtol=1e-3, atol=1e-3)


def test_sharded_filtering_matches_oracle():
    d = 2
    f, h, r, q = _params(d)
    B, T = 32, 50
    rng = np.random.default_rng(1)
    ys = rng.standard_normal((T, B, d)).astype(np.float32)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("batch",))
    filt = make_sharded_filtering(
        mesh, jnp.asarray(f), jnp.asarray(q), jnp.asarray(h), jnp.asarray(r)
    )
    m = np.zeros((B, d), np.float32)
    p = np.tile(10 * np.eye(d, dtype=np.float32), (B, 1, 1))
    state = FilterState(
        jax.device_put(m, NamedSharding(mesh, P("batch"))),
        jax.device_put(p, NamedSharding(mesh, P("batch"))),
    )
    final, means = filt(state, jax.device_put(ys, NamedSharding(mesh, P(None, "batch"))))

    # oracle: numpy Kalman filter on chain 3
    i = 3
    mm, pp = m[i], p[i]
    for t in range(T):
        mm = f @ mm
        pp = f @ pp @ f.T + q
        s = h @ pp @ h.T + r
        k = pp @ h.T @ np.linalg.inv(s)
        mm = mm + k @ (ys[t, i] - h @ mm)
        pp = (np.eye(d) - k @ h) @ pp
        np.testing.assert_allclose(np.asarray(means[t, i]), mm, rtol=2e-3, atol=2e-3)


def test_hybrid_dcn_mesh_matches_flat_mesh():
    """Hybrid (host x batch) DCN/ICI mesh produces the same posterior as the
    flat 8-chip mesh — the tuple-axis psum is numerically the same reduction,
    just lowered hierarchically (ICI within hosts, DCN across)."""
    from rxinfer_tpu.parallel.mesh import make_hybrid_mesh

    d = 2
    f, h, r, _ = _params(d)
    m0 = np.zeros(d, np.float32)
    p0 = 10 * np.eye(d, dtype=np.float32)
    nu0 = jnp.asarray(4.0)
    s0_inv = jnp.eye(d, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    y = rng.standard_normal((16, 24, d)).astype(np.float32)

    hmesh = make_hybrid_mesh(n_hosts=2, axis_names=("host", "batch"))
    assert hmesh.devices.shape == (2, 4)
    hstep = make_sharded_step(
        hmesh, jnp.asarray(m0), jnp.asarray(p0), jnp.asarray(f),
        jnp.asarray(h), jnp.asarray(r), nu0, s0_inv,
        axis_name=("host", "batch"),
    )
    hstate = HierLGSSMState(nu0 + 0.0, s0_inv + 0.0)
    yh = jax.device_put(y, NamedSharding(hmesh, P(("host", "batch"))))
    hst, (hmeans, _) = hstep(hstate, yh)

    fmesh = Mesh(np.asarray(jax.devices()[:8]), ("batch",))
    fstep = make_sharded_step(
        fmesh, jnp.asarray(m0), jnp.asarray(p0), jnp.asarray(f),
        jnp.asarray(h), jnp.asarray(r), nu0, s0_inv,
    )
    fstate = HierLGSSMState(nu0 + 0.0, s0_inv + 0.0)
    yf = jax.device_put(y, NamedSharding(fmesh, P("batch")))
    fst, (fmeans, _) = fstep(fstate, yf)

    np.testing.assert_allclose(np.asarray(hst.w_nu), np.asarray(fst.w_nu), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(hst.w_sinv), np.asarray(fst.w_sinv),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hmeans), np.asarray(fmeans),
                               rtol=1e-4, atol=1e-4)
