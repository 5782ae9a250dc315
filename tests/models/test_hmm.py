"""Hidden Markov model with Dirichlet-Categorical transitions — structured
mean-field VMP (reference: test/models/statespace/hmm_tests.jl:8-29 and
BASELINE.json config 3)."""

import numpy as np

import rxinfer_tpu as rx
from rxinfer_tpu.dists import DirichletCollection


def simulate_hmm(T, A, B, seed=0):
    rng = np.random.default_rng(seed)
    k, m = B.shape[1], B.shape[0]
    s = np.zeros(T, dtype=np.int64)
    y = np.zeros(T, dtype=np.int64)
    s[0] = rng.integers(k)
    y[0] = rng.choice(m, p=B[:, s[0]])
    for t in range(1, T):
        s[t] = rng.choice(k, p=A[:, s[t - 1]])
        y[t] = rng.choice(m, p=B[:, s[t]])
    onehot = np.eye(m, dtype=np.float32)[y]
    return s, onehot


def make_model(k=3, m=3):
    @rx.model
    def hmm(y):
        T = len(y)
        A = rx.DirichletCollection(np.ones((k, k), dtype=np.float32))
        B = rx.DirichletCollection(np.ones((m, k), dtype=np.float32))
        s = rx.latent(T, name="s")
        s[0] = rx.Categorical(np.ones(k, dtype=np.float32) / k)
        for t in rx.plate(1, T):
            s[t] = rx.Transition(s[t - 1], A)
        for t in rx.plate(T):
            y[t] = rx.Transition(s[t], B)
        return {"A": A, "B": B, "s": s}

    return hmm


def test_hmm_structured_vmp():
    A_true = np.array(
        [[0.9, 0.05, 0.05], [0.05, 0.9, 0.05], [0.05, 0.05, 0.9]], dtype=np.float64
    ).T  # columns = from-state
    A_true = A_true / A_true.sum(0)
    B_true = np.array(
        [[0.9, 0.05, 0.05], [0.05, 0.9, 0.05], [0.05, 0.05, 0.9]], dtype=np.float64
    )
    B_true = B_true / B_true.sum(0)
    s_true, y = simulate_hmm(600, A_true, B_true, seed=2)

    init = {
        "A": DirichletCollection(np.full((3, 3), 1.0, dtype=np.float32)),
        "B": DirichletCollection(
            np.float32(np.eye(3) * 5.0 + 1.0)
        ),  # break label symmetry towards identity emission
    }
    res = rx.infer(returnvars=rx.KeepLast(), 
        model=make_model(), data={"y": y}, iterations=25,
        initialization=init, free_energy=True,
    )

    # state decoding accuracy (identity-ish emission → labels aligned)
    gam = np.asarray(res.posteriors["s"].mean())
    acc = (gam.argmax(-1) == s_true).mean()
    assert acc > 0.85, acc

    # learned transition matrix close to truth
    a_mean = np.asarray(res.posteriors["A"].mean())
    assert np.abs(a_mean - A_true).max() < 0.15, a_mean

    # FE decreases (up to fp32 roundoff at convergence: |FE| ~ 1e4)
    fe = np.asarray(res.free_energy)
    tol = 5e-5 * np.abs(fe[:-1])
    assert (fe[1:] - fe[:-1] <= tol).all(), fe
    assert np.isfinite(fe).all()
