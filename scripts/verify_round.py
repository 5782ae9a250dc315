"""End-to-end verify on the real chip: LGSSM smoothing + FE (exercises
small_inv/small_logdet in gaussian/kalman/bethe), plus streaming filter path.
Run from /root/repo: timeout 500 python scripts/verify_round.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import rxinfer_tpu as rx
import jax.numpy as jnp


def main():
    d, T = 4, 200
    rng = np.random.default_rng(0)
    ang = 0.3
    F = np.eye(d, dtype=np.float32)
    F[:2, :2] = [[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]]
    Q = 0.1 * np.eye(d, dtype=np.float32)
    H = np.eye(d, dtype=np.float32)
    R = 0.5 * np.eye(d, dtype=np.float32)
    x = np.zeros(d, dtype=np.float32)
    xs, ys = [], []
    for _ in range(T):
        x = (F @ x + rng.multivariate_normal(np.zeros(d), Q)).astype(np.float32)
        xs.append(x)
        ys.append(x + rng.multivariate_normal(np.zeros(d), R).astype(np.float32))
    xs = np.stack(xs)
    ys = np.stack(ys)
    m0 = np.zeros(d, dtype=np.float32)
    V0 = np.eye(d, dtype=np.float32)

    @rx.model
    def lgssm(y):
        n = len(y)
        z = rx.latent(n, name="z")
        z[0] = rx.MvNormal(mean=m0, cov=V0)
        for t in rx.plate(1, n):
            z[t] = rx.MvNormal(mean=F @ z[t - 1], cov=Q)
        for t in rx.plate(n):
            y[t] = rx.MvNormal(mean=H @ z[t], cov=R)

    res = rx.infer(model=lgssm, data={"y": jnp.asarray(ys)},
                   iterations=1, free_energy=True)
    fe = float(np.asarray(res.free_energy[-1]))
    means = np.asarray(res.posteriors["z"].mean())
    err = np.abs(means - xs).max()
    print("LGSSM d=4 smoothing: FE =", fe, " max |mean-truth| =", err)
    assert np.isfinite(fe)
    assert err < 3.0, err
    print("OK batch")

    # streaming filter surface
    from rxinfer_tpu.parallel.filtering import FilterState, filtering_scan
    B = 64
    st = FilterState(jnp.zeros((B, d)), jnp.broadcast_to(jnp.eye(d), (B, d, d)))
    ysb = jnp.broadcast_to(jnp.asarray(ys)[:, None, :], (T, B, d))
    fin, mseq = filtering_scan(st, ysb, jnp.asarray(F), jnp.asarray(Q),
                               jnp.asarray(H), jnp.asarray(R))
    print("streaming filter final mean[0]:", np.asarray(fin.m[0]))
    assert np.isfinite(np.asarray(fin.m)).all()
    print("OK streaming")


if __name__ == "__main__":
    main()
