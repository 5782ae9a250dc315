"""Bayesian model selection with a generic Mixture node + log-scale
annotations (reference: `Mixture(switch=...)` + LogScaleAnnotations Bayes
factors, test/models/mixtures/mixture_tests.jl)."""
import _common  # noqa: F401
import numpy as np

import rxinfer_tpu as rx

rng = np.random.default_rng(42)
n = 30
y = (rng.uniform(size=n) < 0.75).astype(np.float32)

# Two competing priors for the coin bias, weighed 30/70 a priori
@rx.model
def mix(y):
    selector = rx.Categorical(np.array([0.3, 0.7], np.float32))
    skeptic = rx.Beta(4.0, 8.0)     # "the coin is biased to tails"
    believer = rx.Beta(8.0, 4.0)    # "the coin is biased to heads"
    theta = rx.Mixture(selector, (skeptic, believer))
    for i in rx.plate(n):
        y[i] = rx.Bernoulli(theta)
    return {"selector": selector, "theta": theta}


res = rx.infer(
    model=mix, data={"y": y}, iterations=10, returnvars=rx.KeepLast(),
    annotations=rx.LogScaleAnnotations(),
)

post = res.posteriors["selector"]
w = np.asarray(post.probs())
log_evidence = float(rx.getlogscale(res.posteriors["theta"]))
theta_mix = res.posteriors["theta"]
print(f"observed {int(y.sum())}/{n} heads")
print(f"posterior model weights: skeptic={w[0]:.3f} believer={w[1]:.3f}")
print(f"log evidence: {log_evidence:.3f}")
print(f"mixture posterior component means: "
      f"{[round(float(theta_mix.component(k).mean()), 3) for k in range(2)]}")
print(f"model selection favours believer: {bool(w[1] > w[0])}")
