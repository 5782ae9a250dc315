"""Round-5 verify script: drive the advisor-fix surfaces end-to-end on the
real chip (run from /root/repo with plain python).

1. Full-rank multivariate delta forward message (ridge now gated off) —
   linear MvNormal delta must stay exact.
2. Damped GCV chain (first-sweep message no longer natural-roundtripped) —
   HGF with meta damping converges, FE near-monotone.
3. infer_batched(shared=...) still matches the pooled semantics.
"""

import numpy as np
import jax.numpy as jnp

import rxinfer_tpu as rx
from rxinfer_tpu.dists import MvNormalMeanCovariance, NormalMeanVariance


def check_delta_full_rank():
    # y = A x + noise via a Delta; A square full rank -> forward pushforward
    # full rank -> no ridge; posterior must match the exact linear-Gaussian.
    rng = np.random.default_rng(0)
    A = np.array([[2.0, 0.5], [-0.3, 1.5]], np.float32)
    x_true = np.array([1.0, -0.5], np.float32)
    n = 40
    y = (x_true @ A.T + 0.1 * rng.standard_normal((n, 2))).astype(np.float32)

    @rx.model
    def m(y):
        x = rx.MvNormal(mean=np.zeros(2, np.float32),
                        cov=10.0 * np.eye(2, dtype=np.float32))
        for i in rx.plate(n):
            y[i] = rx.MvNormal(mean=rx.Delta(lambda t: jnp.asarray(A) @ t, x),
                               cov=0.01 * np.eye(2, dtype=np.float32))
        return {"x": x}

    res = rx.infer(returnvars=rx.KeepLast(), model=m, data={"y": y},
                   iterations=10,
                   initialization={"x": MvNormalMeanCovariance(
                       np.zeros(2, np.float32),
                       10.0 * np.eye(2, dtype=np.float32))})
    q = res.posteriors["x"]
    W = np.linalg.inv(10.0 * np.eye(2)) + n * A.T @ np.linalg.inv(
        0.01 * np.eye(2)) @ A
    mu = np.linalg.solve(W, A.T @ np.linalg.inv(0.01 * np.eye(2)) @ y.sum(0))
    err = np.abs(np.asarray(q.mean()) - mu).max()
    assert err < 2e-3, (np.asarray(q.mean()), mu)
    print(f"[1] delta full-rank exact: mean err {err:.2e} OK")


def check_damped_hgf():
    T = 100
    rng = np.random.default_rng(5)
    z = np.zeros(T)
    x = np.zeros(T)
    for t in range(1, T):
        z[t] = z[t - 1] + 0.155 * rng.standard_normal()
        x[t] = x[t - 1] + np.exp(0.5 * (z[t] - 2.0)) * rng.standard_normal()
    y = (x + 0.1 * rng.standard_normal(T)).astype(np.float32)

    @rx.model
    def hgf(y):
        z = rx.latent(T, name="z")
        x = rx.latent(T, name="x")
        z[0] = rx.Normal(mean=0.0, var=1.0)
        x[0] = rx.Normal(mean=0.0, var=1.0)
        for t in rx.plate(1, T):
            z[t] = rx.Normal(mean=z[t - 1], var=0.01)
            x[t] = rx.GCV(x[t - 1], z[t], kappa=1.0, omega=-2.0)
        for t in rx.plate(T):
            y[t] = rx.Normal(mean=x[t], var=0.01)
        return {"z": z, "x": x}

    res = rx.infer(model=hgf, data={"y": y}, iterations=25,
                   meta={"GCV": {"damping": 0.8}},
                   initialization={"z": NormalMeanVariance(0.0, 5.0)},
                   free_energy=True, returnvars=rx.KeepLast())
    fe = np.asarray(res.free_energy)
    assert np.isfinite(fe).all()
    diffs = np.diff(fe)
    assert np.all(diffs < 0.25), diffs[diffs > 0]
    assert fe[-1] < fe[0] - 30.0, (fe[0], fe[-1])
    print(f"[2] damped HGF: FE {fe[0]:.1f} -> {fe[-1]:.1f}, "
          f"max increase {diffs.max():.3f} OK")


def check_shared():
    B, T = 4, 32
    rng = np.random.default_rng(1)
    ys = []
    for b in range(B):
        xx = np.cumsum(0.5 * rng.standard_normal(T)).astype(np.float32)
        ys.append(xx + rng.standard_normal(T).astype(np.float32) / 2.0)
    y = np.stack(ys).astype(np.float32)

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

    from rxinfer_tpu.dists import GammaShapeRate
    res = rx.infer_batched(model=walk_tau, data={"y": y}, iterations=8,
                           shared=("tau",), free_energy=True,
                           initialization={"tau": GammaShapeRate(2.0, 2.0)})
    q = res.posteriors["tau"]
    est = float(np.asarray(q.mean()).reshape(-1)[0])
    assert 1.0 < est < 12.0, est
    fe = np.asarray(res.free_energy)
    assert fe.shape == (8,) and np.isfinite(fe).all()
    print(f"[3] shared tau pooled: E[tau]={est:.2f}, FE global shape OK")


if __name__ == "__main__":
    check_delta_full_rank()
    check_damped_hgf()
    check_shared()
    print("VERIFY R5 ADVISOR FIXES: ALL OK")
