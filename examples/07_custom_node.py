"""Custom node with only a logpdf — NodeFunctionRuleFallback + projection
(reference: undefinedrules.md)."""
import _common  # noqa: F401
import jax.numpy as jnp
import numpy as np

import rxinfer_tpu as rx
from rxinfer_tpu.dists import Beta as BetaDist
from rxinfer_tpu.engine.projection import ProjectedTo
from rxinfer_tpu.rules.registry import node


@node("MyBernoulli")
class MyBernoulli:
    interfaces = ("out", "p")

    @staticmethod
    def logpdf(values):
        y, p = values["out"], jnp.clip(values["p"], 1e-6, 1 - 1e-6)
        return y * jnp.log(p) + (1.0 - y) * jnp.log1p(-p)


rng = np.random.default_rng(2)
y = (rng.uniform(size=600) < 0.31).astype(np.float32)


@rx.model
def m(y):
    p = rx.Beta(1.0, 1.0)
    for i in rx.plate(len(y)):
        y[i] = rx.factor_node("MyBernoulli", p=p)
    return {"p": p}


res = rx.infer(returnvars=rx.KeepLast(), model=m, data={"y": y}, iterations=8,
               constraints=rx.constraints(forms={"p": ProjectedTo("beta")}),
               initialization={"p": BetaDist(1.0, 1.0)},
               options={"rulefallback": rx.NodeFunctionRuleFallback()})
print(f"p ~ {float(res.posteriors['p'].mean()):.3f} (true 0.31)")
