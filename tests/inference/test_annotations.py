"""LogScale annotations + postprocess strategies (reference: ReactiveMP
LogScaleAnnotations / AddonLogScale, docs/src/manuals/inference/postprocess.md,
CHANGELOG v5 rename notes)."""

import numpy as np
from scipy.special import betaln

import rxinfer_tpu as rx
from rxinfer_tpu.dists import Beta as BetaDist


def _coin_model():
    @rx.model
    def coin(y):
        theta = rx.Beta(4.0, 8.0)
        for i in rx.plate(len(y)):
            y[i] = rx.Bernoulli(theta)
        return {"theta": theta}

    return coin


def _coin_logZ(a, b, y):
    h = float(np.sum(y))
    t = float(len(y) - h)
    return betaln(a + h, b + t) - betaln(a, b)


def test_logscale_equals_log_evidence_on_tree():
    y = np.array([1, 0, 1, 1, 0, 1, 1, 1, 0, 1], np.float32)
    res = rx.infer(returnvars=rx.KeepLast(), model=_coin_model(), data={"y": y}, iterations=2,
                   annotations=rx.LogScaleAnnotations())
    post = res.posteriors["theta"]
    assert isinstance(post, rx.Marginal)
    ls = float(rx.getlogscale(post))
    assert abs(ls - _coin_logZ(4.0, 8.0, y)) < 1e-4
    # the wrapper forwards distribution methods
    assert abs(float(post.mean()) - (4.0 + 7.0) / (4.0 + 8.0 + 10.0)) < 1e-5


def test_logscale_bayes_factor():
    """Difference of log-scales across two priors == analytic log Bayes factor
    (the reference's model-comparison workflow for AddonLogScale)."""
    y = np.array([1, 1, 1, 1, 0, 1, 1, 1], np.float32)

    def coin_with(a, b):
        @rx.model
        def coin(yy):
            theta = rx.Beta(a, b)
            for i in rx.plate(len(yy)):
                yy[i] = rx.Bernoulli(theta)
            return {"theta": theta}

        return coin

    ls = []
    for (a, b) in ((8.0, 2.0), (2.0, 8.0)):
        r = rx.infer(returnvars=rx.KeepLast(), model=coin_with(a, b), data={"yy": y}, iterations=1,
                     annotations=rx.LogScaleAnnotations())
        ls.append(float(rx.getlogscale(r.posteriors["theta"])))
    exact = _coin_logZ(8.0, 2.0, y) - _coin_logZ(2.0, 8.0, y)
    assert abs((ls[0] - ls[1]) - exact) < 1e-4
    assert ls[0] > ls[1]  # heads-heavy data favors the heads-heavy prior


def test_default_postprocess_unwraps_without_annotations():
    y = np.array([1, 0, 1], np.float32)
    res = rx.infer(model=_coin_model(), data={"y": y})
    assert isinstance(res.posteriors["theta"], BetaDist)
    assert rx.getannotations(res.posteriors["theta"]) == {}


def test_noop_postprocess_explicit_and_custom_strategy():
    y = np.array([1, 0, 1], np.float32)
    # explicit Noop without annotations: bare dist stays bare (nothing to keep)
    res = rx.infer(model=_coin_model(), data={"y": y},
                   postprocess=rx.NoopPostprocess())
    assert isinstance(res.posteriors["theta"], BetaDist)
    # custom strategy (reference: custom inference_postprocess methods)
    res2 = rx.infer(model=_coin_model(), data={"y": y},
                    postprocess=lambda m: str(rx.getdata(m)))
    assert isinstance(res2.posteriors["theta"], str)
    # explicit Unpack with annotations strips the wrapper
    res3 = rx.infer(model=_coin_model(), data={"y": y},
                    annotations=rx.LogScaleAnnotations(),
                    postprocess=rx.UnpackMarginalPostprocess())
    assert isinstance(res3.posteriors["theta"], BetaDist)


def test_logscale_keep_each_per_iteration():
    y = np.array([1.0, 0.0, 1.0, 1.0], np.float32)
    res = rx.infer(model=_coin_model(), data={"y": y}, iterations=3,
                   returnvars=rx.KeepEach(),
                   annotations=rx.LogScaleAnnotations())
    posts = res.posteriors["theta"]
    assert isinstance(posts, list) and len(posts) == 3
    vals = [float(rx.getlogscale(p)) for p in posts]
    # conjugate tree: exact from sweep 1, constant across iterations
    exact = _coin_logZ(4.0, 8.0, y)
    for v in vals:
        assert abs(v - exact) < 1e-4


def test_getlogscale_missing_raises():
    y = np.array([1.0], np.float32)
    res = rx.infer(model=_coin_model(), data={"y": y})
    try:
        rx.getlogscale(res.posteriors["theta"])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "LogScaleAnnotations" in str(e)


def test_logscale_infer_batched():
    """Round-4: annotations=LogScaleAnnotations() works through
    infer_batched — the evidence post-pass is vmapped over the batch inside
    one jitted program; each posterior's log_scale carries the batch axis and
    matches the per-dataset single-program values."""
    rng = np.random.default_rng(0)
    B, n = 4, 10
    Y = (rng.uniform(size=(B, n)) < 0.7).astype(np.float32)
    res = rx.infer_batched(_coin_model(), data={"y": Y}, iterations=2,
                           annotations=rx.LogScaleAnnotations(),
                           returnvars=rx.KeepLast())
    post = res.posteriors["theta"]
    assert isinstance(post, rx.Marginal)
    ls = np.asarray(rx.getlogscale(post))
    assert ls.shape == (B,)
    for b in range(B):
        expected = _coin_logZ(4.0, 8.0, Y[b])
        assert abs(ls[b] - expected) < 1e-4, (b, ls[b], expected)
        single = rx.infer(model=_coin_model(), data={"y": Y[b]},
                          iterations=2, returnvars=rx.KeepLast(),
                          annotations=rx.LogScaleAnnotations())
        assert abs(ls[b] - float(rx.getlogscale(
            single.posteriors["theta"]))) < 1e-4
