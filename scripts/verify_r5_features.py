"""Round-5 verify: drive the new feature surfaces end-to-end on the real chip.

1. observation_dtype=int8 through rx.infer_batched (posterior close to fp32).
2. Composed mixture FE (mixture + observed plain part).
3. Mesh streaming engine throughput sanity after the smallmat mean() fix.
4. d=16 chain through the engine (now on the SoA scan path).
5. Chunked shared= pooled aggregation.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import rxinfer_tpu as rx


def check_int8():
    rng = np.random.default_rng(0)
    B, T, d = 64, 256, 2
    F = np.array([[0.99, -0.1], [0.1, 0.99]], np.float32)
    y = rng.standard_normal((B, T, d)).astype(np.float32) * 3.0

    @rx.model
    def m(y):
        T_ = len(y)
        x = rx.latent(T_, name="x")
        x[0] = rx.MvNormal(mean=np.zeros(d, np.float32),
                           cov=25.0 * np.eye(d, dtype=np.float32))
        for t in rx.plate(1, T_):
            x[t] = rx.MvNormal(mean=F @ x[t - 1],
                               cov=np.eye(d, dtype=np.float32))
        for t in rx.plate(T_):
            y[t] = rx.MvNormal(mean=x[t], cov=np.eye(d, dtype=np.float32))
        return {"x": x}

    pf, _ = rx.infer_batched(m, {"y": y}, iterations=1)
    pq, feq = rx.infer_batched(m, {"y": y}, iterations=1, free_energy=True,
                               options={"observation_dtype": "int8"})
    mu_f = np.asarray(pf["x"].mean())
    mu_q = np.asarray(pq["x"].mean())
    err = np.abs(mu_q - mu_f).max() / np.abs(mu_f).max()
    assert err < 0.05, err
    assert np.isfinite(np.asarray(feq)).all()
    print(f"[1] int8 ingest: rel err {err:.4f}, FE finite OK")


def check_mixture_fe():
    from scipy.special import betaln

    from rxinfer_tpu.dists import Beta as BD

    rng = np.random.default_rng(42)
    y = (rng.uniform(size=8) < 0.7).astype(np.float32)
    n, s = len(y), float(y.sum())
    w = (0.5 + 0.4 * rng.standard_normal(4)).astype(np.float32)

    @rx.model
    def mix(y, w):
        selector = rx.Categorical(np.array([0.5, 0.5], np.float32))
        in1 = rx.Beta(4.0, 8.0)
        in2 = rx.Beta(8.0, 4.0)
        theta = rx.Mixture(selector, (in1, in2))
        x = rx.Normal(mean=0.0, var=1.0)
        for i in rx.plate(4):
            w[i] = rx.Normal(mean=x, var=1.0)
        for i in rx.plate(n):
            y[i] = rx.Bernoulli(theta)
        return {"theta": theta, "x": x}

    res = rx.infer(model=mix, data={"y": y, "w": w}, free_energy=True,
                   returnvars=rx.KeepLast(),
                   initialization={"in1": BD(4.0, 8.0), "in2": BD(8.0, 4.0),
                                   "theta": BD(1.0, 1.0)})
    fe = float(np.asarray(res.free_energy)[-1])

    def lz(a, b):
        return betaln(a + s, b + n - s) - betaln(a, b)

    lz_mix = np.logaddexp(np.log(0.5) + lz(4.0, 8.0),
                          np.log(0.5) + lz(8.0, 4.0))
    # plain part: x with 4 gaussian obs — exact logZ
    v_post = 1.0 / (1.0 + 4.0)
    m_post = v_post * w.sum()
    lz_plain = float(
        -0.5 * 4 * np.log(2 * np.pi) + 0.5 * np.log(v_post)
        - 0.5 * (w @ w) + 0.5 * m_post ** 2 / v_post)
    expected = -(lz_mix + lz_plain)
    assert abs(fe - expected) < 5e-2, (fe, expected)
    print(f"[2] composed mixture FE {fe:.4f} vs -logZ {expected:.4f} OK")


def check_stream_speed():
    d = 4
    F = np.eye(d, dtype=np.float32)
    R = np.eye(d, dtype=np.float32)
    Q = np.eye(d, dtype=np.float32)
    P0 = 25 * np.eye(d, dtype=np.float32)
    B, T = 10_000, 200
    ys = jnp.asarray(np.random.default_rng(0).standard_normal(
        (T, B, d)).astype(np.float32))

    @rx.model
    def tick(y, pm, pc):
        x = rx.MvNormal(mean=pm, cov=pc)
        y.observe(rx.MvNormal(mean=x, cov=R))
        return {"x": x}

    au = rx.autoupdates(
        initial={"pm": np.zeros((B, d), np.float32),
                 "pc": np.broadcast_to(P0, (B, d, d)).copy()},
        pm=lambda q: jnp.einsum("ij,bj->bi", jnp.asarray(F), q["x"].mean()),
        pc=lambda q: jnp.einsum("ij,bjk,lk->bil", jnp.asarray(F),
                                q["x"].cov(), jnp.asarray(F))
        + jnp.asarray(Q),
    )
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("dp",))
    eng = rx.infer(model=tick, datastream=None, autoupdates=au, mesh=mesh,
                   options={"warn": False})
    posts, _ = eng.run_offline({"y": ys})   # compile
    jax.block_until_ready(posts["x"].mean())
    t0 = time.perf_counter()
    posts, _ = eng.run_offline({"y": ys})
    jax.block_until_ready(posts["x"].mean())
    dt = time.perf_counter() - t0
    ups = B * T / dt
    assert np.isfinite(np.asarray(posts["x"].mean())).all()
    print(f"[3] mesh streaming engine: {ups / 1e6:.1f}M state updates/s "
          f"(host-timed incl. dispatch) OK")


def check_d16():
    rng = np.random.default_rng(1)
    d, T, B = 16, 2000, 16
    F = np.kron(np.eye(d // 2, dtype=np.float32),
                np.array([[0.99, -0.1], [0.1, 0.99]], np.float32))
    y = rng.standard_normal((B, T, d)).astype(np.float32)

    @rx.model
    def m(y):
        T_ = len(y)
        x = rx.latent(T_, name="x")
        x[0] = rx.MvNormal(mean=np.zeros(d, np.float32),
                           cov=25.0 * np.eye(d, dtype=np.float32))
        for t in rx.plate(1, T_):
            x[t] = rx.MvNormal(mean=F @ x[t - 1],
                               cov=np.eye(d, dtype=np.float32))
        for t in rx.plate(T_):
            y[t] = rx.MvNormal(mean=x[t], cov=np.eye(d, dtype=np.float32))
        return {"x": x}

    posts, _ = rx.infer_batched(m, {"y": y}, iterations=1,
                                options={"warn": False})
    mu = np.asarray(posts["x"].mean())
    assert mu.shape == (B, T, d) and np.isfinite(mu).all()
    print("[4] d=16 engine chain (SoA path): finite posteriors OK")


def check_chunked_shared():
    from rxinfer_tpu.dists import GammaShapeRate

    rng = np.random.default_rng(1)
    B, T = 4, 64
    ys = []
    for b in range(B):
        xx = np.cumsum(0.5 * rng.standard_normal(T)).astype(np.float32)
        ys.append(xx + rng.standard_normal(T).astype(np.float32) / 2.0)
    y = np.stack(ys).astype(np.float32)

    @rx.model
    def walk_tau(y):
        T_ = len(y)
        tau = rx.Gamma(shape=2.0, rate=2.0)
        x = rx.latent(T_, name="x")
        x[0] = rx.Normal(mean=0.0, var=100.0)
        for t in rx.plate(1, T_):
            x[t] = rx.Normal(mean=x[t - 1], var=0.25)
        for t in rx.plate(T_):
            y[t] = rx.Normal(mean=x[t], precision=tau)
        return {"x": x, "tau": tau}

    init = {"tau": GammaShapeRate(2.0, 2.0)}
    ref = rx.infer_batched(walk_tau, {"y": y}, iterations=4, shared=("tau",),
                           initialization=init)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        res = rx.infer_batched(walk_tau, {"y": y}, iterations=4,
                               shared=("tau",), initialization=init,
                               options={"hbm_budget_bytes": 7_000})
    a = float(np.asarray(ref[0]["tau"].mean()).reshape(-1)[0])
    b = float(np.asarray(res[0]["tau"].mean()).reshape(-1)[0])
    assert abs(a - b) / abs(a) < 1e-4, (a, b)
    print(f"[5] chunked shared pooled E[tau]: {b:.4f} == unchunked {a:.4f} OK")


if __name__ == "__main__":
    check_int8()
    check_mixture_fe()
    check_stream_speed()
    check_d16()
    check_chunked_shared()
    print("VERIFY R5 FEATURES: ALL OK")
