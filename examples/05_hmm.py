"""Hidden Markov model with unknown transition/emission matrices —
structured mean-field VMP (BASELINE config 3)."""
import _common  # noqa: F401
import numpy as np

import rxinfer_tpu as rx
from rxinfer_tpu.dists import DirichletCollection

rng = np.random.default_rng(3)
K, T = 3, 300
A_true = np.array([[0.9, 0.05, 0.05], [0.05, 0.9, 0.05], [0.05, 0.05, 0.9]])
s = rng.integers(K)
obs = np.zeros(T, np.int64)
for t in range(T):
    s = rng.choice(K, p=A_true[:, s])
    obs[t] = rng.choice(K, p=A_true[:, s])
y1 = np.eye(K, dtype=np.float32)[obs]

from rxinfer_tpu.models import zoo
model = zoo.hmm(K, K)
res = rx.infer(returnvars=rx.KeepLast(), 
    model=model, data={"y": y1}, iterations=25,
    initialization={"A": DirichletCollection(np.full((K, K), 1.0, np.float32)),
                    "B": DirichletCollection(np.float32(np.eye(K) * 5.0 + 1.0))},
)
A_est = np.asarray(res.posteriors["A"].mean())
print("estimated transition diagonal:", np.diag(A_est).round(2), "(true 0.9)")
