"""Multiple chains sharing parameters in one model — the practical form of the
reference's nested-plate models (``x[k, t]``,
test/models/statespace/collision_tests.jl / multi-sequence HMMs): each
sequence is its own chain block; the shared parameter's marginal is the
natural-parameter product of every chain's messages (the psum-friendly
aggregation of SURVEY.md §2.3)."""

import numpy as np

import rxinfer_tpu as rx
from rxinfer_tpu.dists import DirichletCollection

K = 3
A_TRUE = np.array([[0.9, 0.05, 0.05], [0.05, 0.9, 0.05], [0.05, 0.05, 0.9]])


def _sim(T, seed):
    rng = np.random.default_rng(seed)
    s = np.zeros(T, np.int64)
    s[0] = rng.integers(K)
    for t in range(1, T):
        s[t] = rng.choice(K, p=A_TRUE[:, s[t - 1]])
    return np.eye(K, dtype=np.float32)[s]


def test_three_hmm_sequences_share_transition_matrix():
    y1, y2, y3 = _sim(150, 0), _sim(150, 1), _sim(150, 2)
    b_emit = (0.9 * np.eye(K) + 0.05 * (1 - np.eye(K))).astype(np.float32)

    @rx.model
    def multi_hmm(y1, y2, y3):
        A = rx.DirichletCollection(np.ones((K, K), np.float32))
        out = {"A": A}
        for name, y in (("s1", y1), ("s2", y2), ("s3", y3)):
            T = len(y)
            s = rx.latent(T, name=name)
            s[0] = rx.Categorical(np.ones(K, np.float32) / K)
            for t in rx.plate(1, T):
                s[t] = rx.Transition(s[t - 1], A)
            for t in rx.plate(T):
                y[t] = rx.Transition(s[t], b_emit)
            out[name] = s
        return out

    res = rx.infer(returnvars=rx.KeepLast(), 
        model=multi_hmm, data={"y1": y1, "y2": y2, "y3": y3}, iterations=15,
        initialization={"A": DirichletCollection(np.ones((K, K), np.float32))},
        free_energy=True,
    )
    est = np.asarray(res.posteriors["A"].mean())
    assert np.abs(est - A_TRUE).max() < 0.1, est
    fe = np.asarray(res.free_energy)
    # coordinate ascent: decreasing up to float32 noise at the fixed point
    assert (np.diff(fe) <= 0.1).all(), np.diff(fe)
    # pooling three sequences beats one sequence alone
    res1 = rx.infer(returnvars=rx.KeepLast(), 
        model=multi_hmm, data={"y1": y1, "y2": y1, "y3": y1}, iterations=15,
        initialization={"A": DirichletCollection(np.ones((K, K), np.float32))},
    )
    # (same data three times is a degenerate check of graph wiring, not
    # accuracy; just assert it runs and stays on the simplex)
    np.testing.assert_allclose(
        np.asarray(res1.posteriors["A"].mean()).sum(axis=0), 1.0, rtol=1e-4
    )
