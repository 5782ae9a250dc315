"""infer_batched(shared=...) — pooled parameters across the batch (round-4
mandate: SURVEY §2.3 strategy 2 reachable from the product surface).

The shared posterior must match the explicit pooled model run through
rx.infer, and the mesh= path (psum aggregation) must match the unsharded
batched path."""

import numpy as np
import pytest
import jax
from jax.sharding import Mesh

import rxinfer_tpu as rx
from rxinfer_tpu.dists import GammaShapeRate

B, T = 4, 64
TAU_TRUE = 4.0


def _data(seed=0):
    rng = np.random.default_rng(seed)
    ys = []
    for b in range(B):
        x = np.cumsum(0.5 * rng.standard_normal(T)).astype(np.float32)
        ys.append(x + rng.standard_normal(T).astype(np.float32)
                  / np.sqrt(TAU_TRUE))
    return np.stack(ys).astype(np.float32)


@rx.model
def walk_tau(y):
    T = len(y)
    tau = rx.Gamma(shape=2.0, rate=2.0)
    x = rx.latent(T, name="x")
    x[0] = rx.Normal(mean=0.0, var=100.0)
    for t in rx.plate(1, T):
        x[t] = rx.Normal(mean=x[t - 1], var=0.25)
    for t in rx.plate(T):
        y[t] = rx.Normal(mean=x[t], precision=tau)
    return {"x": x, "tau": tau}


def _pooled_model():
    @rx.model
    def pooled(y0, y1, y2, y3):
        tau = rx.Gamma(shape=2.0, rate=2.0)
        for name, y in (("x0", y0), ("x1", y1), ("x2", y2), ("x3", y3)):
            T = len(y)
            x = rx.latent(T, name=name)
            x[0] = rx.Normal(mean=0.0, var=100.0)
            for t in rx.plate(1, T):
                x[t] = rx.Normal(mean=x[t - 1], var=0.25)
            for t in rx.plate(T):
                y[t] = rx.Normal(mean=x[t], precision=tau)
        return {"tau": tau}

    return pooled


def test_shared_matches_pooled_model():
    Y = _data()
    init = {"tau": GammaShapeRate(2.0, 2.0)}
    res = rx.infer_batched(walk_tau, data={"y": Y}, iterations=10,
                           free_energy=True, shared=("tau",),
                           initialization=init,
                           returnvars=rx.KeepLast())
    pooled = rx.infer(model=_pooled_model(),
                      data={f"y{b}": Y[b] for b in range(B)},
                      iterations=10, free_energy=True,
                      initialization=init, returnvars=rx.KeepLast())
    posts, fe = res
    # pooled tau posterior (shared entry is replicated over the batch axis)
    tau_b = posts["tau"]
    tau_mean = np.asarray(tau_b.mean())
    assert tau_mean.shape == (B,)
    np.testing.assert_allclose(tau_mean, tau_mean[0], rtol=1e-6)
    assert float(tau_mean[0]) == pytest.approx(
        float(pooled.posteriors["tau"].mean()), rel=1e-4)
    # per-sequence latents match the pooled model's
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(posts["x"].mean())[b],
            np.asarray(pooled.posteriors[f"x{b}"].mean()),
            rtol=1e-4, atol=1e-4)
    # GLOBAL free energy (shape (iterations,)) matches the pooled Bethe FE
    fe = np.asarray(fe)
    assert fe.shape == (10,)
    np.testing.assert_allclose(fe, np.asarray(pooled.free_energy),
                               rtol=1e-4, atol=1e-2)


def test_shared_mesh_psum_matches_unsharded():
    Y = _data(seed=1)
    init = {"tau": GammaShapeRate(2.0, 2.0)}
    kw = dict(iterations=6, free_energy=True, shared=("tau",),
              initialization=init, returnvars=rx.KeepLast())
    ref = rx.infer_batched(walk_tau, data={"y": Y}, **kw)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("dp",))
    res = rx.infer_batched(walk_tau, data={"y": Y}, mesh=mesh, **kw)
    np.testing.assert_allclose(np.asarray(res[0]["tau"].mean()),
                               np.asarray(ref[0]["tau"].mean()), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(res[0]["x"].mean()),
                               np.asarray(ref[0]["x"].mean()),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res[1]), np.asarray(ref[1]),
                               rtol=1e-5, atol=1e-3)


def test_shared_wishart_process_noise():
    """The VERDICT round-4 scenario: B LGSSM chains with a SHARED unknown
    process-noise precision W ~ Wishart (parallel/hierarchical.py's pattern,
    now reachable from infer_batched)."""
    rng = np.random.default_rng(2)
    d, Bw, Tw = 2, 4, 48
    W_true = np.array([[2.0, 0.3], [0.3, 1.5]], np.float32)
    Q_true = np.linalg.inv(W_true)
    ys = np.zeros((Bw, Tw, d), np.float32)
    for b in range(Bw):
        x = np.zeros(d)
        for t in range(Tw):
            x = 0.9 * x + rng.multivariate_normal(np.zeros(d), Q_true)
            ys[b, t] = x + 0.3 * rng.standard_normal(d)

    from rxinfer_tpu.dists import Wishart

    A = (0.9 * np.eye(d)).astype(np.float32)
    R = (0.09 * np.eye(d)).astype(np.float32)
    nu0 = float(d) + 1.0

    @rx.model
    def hier(y):
        T = len(y)
        W = rx.Wishart(nu0, np.eye(d, dtype=np.float32))
        x = rx.latent(T, name="x")
        x[0] = rx.MvNormal(mean=np.zeros(d, np.float32),
                           cov=(10.0 * np.eye(d)).astype(np.float32))
        for t in rx.plate(1, T):
            x[t] = rx.MvNormal(mean=A @ x[t - 1], precision=W)
        for t in rx.plate(T):
            y[t] = rx.MvNormal(mean=x[t], cov=R)
        return {"x": x, "W": W}

    init = {"W": Wishart(nu0, np.eye(d, dtype=np.float32))}
    res = rx.infer_batched(hier, data={"y": ys}, iterations=10,
                           shared=("W",), free_energy=True,
                           initialization=init, returnvars=rx.KeepLast())
    posts, fe = res
    qW = posts["W"]
    nu = np.asarray(qW.nu)
    np.testing.assert_allclose(nu, nu[0], rtol=1e-6)
    # pooled conjugate dof: nu0 + B*(T-1)
    assert float(nu[0]) == pytest.approx(nu0 + Bw * (Tw - 1), abs=1e-2)
    e_w = float(nu[0]) * np.asarray(qW.s)[0]
    np.testing.assert_allclose(e_w, W_true, rtol=0.5, atol=0.6)
    fe = np.asarray(fe)
    assert fe.shape == (10,)
    assert np.isfinite(fe).all()
    assert (np.diff(fe) <= 1e-3 * np.abs(fe[:-1])).all()
    # mesh path agrees
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("dp",))
    res_m = rx.infer_batched(hier, data={"y": ys}, iterations=10,
                             shared=("W",), free_energy=True, mesh=mesh,
                             initialization=init, returnvars=rx.KeepLast())
    np.testing.assert_allclose(np.asarray(res_m[0]["W"].s),
                               np.asarray(qW.s), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(res_m[1]), fe, rtol=1e-5,
                               atol=1e-3)


def test_shared_validation_errors():
    Y = _data()
    init = {"tau": GammaShapeRate(2.0, 2.0)}
    with pytest.raises(ValueError, match="unknown"):
        rx.infer_batched(walk_tau, data={"y": Y}, shared=("nope",),
                         initialization=init)
    with pytest.raises(ValueError, match="chain"):
        rx.infer_batched(walk_tau, data={"y": Y}, shared=("x",),
                         initialization=init)


def test_shared_with_annotations_carries_global_evidence():
    """annotations= with shared= wraps every posterior with the POOLED
    scalar evidence (−global FE == pooled-tree log Z), not per-element
    scales (review finding: this combination previously produced empty
    annotations silently)."""
    Y = _data(seed=3)
    init = {"tau": GammaShapeRate(2.0, 2.0)}
    res = rx.infer_batched(walk_tau, data={"y": Y}, iterations=4,
                           shared=("tau",), free_energy=True,
                           annotations=rx.LogScaleAnnotations(),
                           initialization=init, returnvars=rx.KeepLast())
    posts, fe = res
    ls = float(rx.getlogscale(posts["tau"]))
    assert ls == pytest.approx(-float(np.asarray(fe)[-1]), rel=1e-6)


def test_streaming_rejects_time_mesh():
    """Streaming shards the batch of parallel streams (round-5 'dp' axis);
    a time mesh is batch-mode only and errors with the pointer."""
    with pytest.raises(ValueError, match="batch-mode only"):
        rx.infer(model=walk_tau, datastream=[{"y": np.zeros(4, np.float32)}],
                 autoupdates=rx.autoupdates(
                     initial={"a": 0.0}, a=lambda q: 0.0),
                 mesh=Mesh(np.asarray(jax.devices()[:2]), ("time",)))


def test_shared_chunked_matches_unchunked():
    """Round-5 (verdict weak item 4): a pooled batch beyond the HBM budget
    runs in sequential chunks with cross-chunk natural-parameter
    accumulation and matches the unchunked pooled result."""
    y = _data()
    init = {"tau": GammaShapeRate(2.0, 2.0)}
    ref = rx.infer_batched(walk_tau, {"y": y}, iterations=4,
                           shared=("tau",), free_energy=True,
                           initialization=init)
    # per-element chain moments ~3 KB at T=64 d=1; budget 7 KB -> chunks of 2
    with pytest.warns(UserWarning, match="sequential chunks"):
        res = rx.infer_batched(walk_tau, {"y": y}, iterations=4,
                               shared=("tau",), free_energy=True,
                               initialization=init,
                               options={"hbm_budget_bytes": 7_000,
                                        "warn": True})
    q_ref, q_chk = ref[0]["tau"], res[0]["tau"]
    np.testing.assert_allclose(np.asarray(q_chk.mean()),
                               np.asarray(q_ref.mean()), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(q_chk.var()),
                               np.asarray(q_ref.var()), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(res[0]["x"].mean()),
                               np.asarray(ref[0]["x"].mean()),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res[1]), np.asarray(ref[1]),
                               rtol=1e-5, atol=1e-3)


def test_shared_chunked_partial_last_chunk():
    """Batch not divisible by the chunk size: padded tail rows must not
    contribute to the pooled update."""
    y = _data()[:3]  # B=3, chunk=2 -> last chunk padded
    init = {"tau": GammaShapeRate(2.0, 2.0)}
    ref = rx.infer_batched(walk_tau, {"y": y}, iterations=3,
                           shared=("tau",), free_energy=True,
                           initialization=init)
    with pytest.warns(UserWarning, match="sequential chunks"):
        res = rx.infer_batched(walk_tau, {"y": y}, iterations=3,
                               shared=("tau",), free_energy=True,
                               initialization=init,
                               options={"hbm_budget_bytes": 7_000})
    np.testing.assert_allclose(np.asarray(res[0]["tau"].mean()),
                               np.asarray(ref[0]["tau"].mean()), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(res[1]), np.asarray(ref[1]),
                               rtol=1e-5, atol=1e-3)
