"""UnfactorizedData: structured (joint) treatment of missing observations
(reference: `infer` with UnfactorizedData,
test/inference/inference_tests.jl:1652-1723; UnfactorizedData struct,
src/model/model.jl:16-31).

The reference model: a 3-step hidden chain with an unknown transition tensor B,
identity observation matrix A, the first observation seen, the rest missing,
and a goal prior pinning the final state.  With the data wrapped in
``UnfactorizedData`` the prediction for the middle observation must equal the
middle state's posterior (identity likelihood ⇒ equal entropy); the default
mean-field prediction is overconfident (lower entropy)."""

import numpy as np

import rxinfer_tpu as rx


def _entropy(p):
    p = np.clip(np.asarray(p, np.float64), 1e-30, 1.0)
    return float(-(p * np.log(p)).sum())


def make_pred_model(goal):
    a_eye = np.eye(4, dtype=np.float32)
    p_s1 = np.array([0.7, 0.3, 0.0, 0.0], dtype=np.float32)

    @rx.model
    def pred_model(y):
        B = rx.DirichletCollection(np.ones((4, 4), dtype=np.float32))
        s = rx.latent(3, name="s")
        s[0] = rx.Categorical(p_s1)
        for t in rx.plate(1, 3):
            s[t] = rx.Transition(s[t - 1], B)
        for t in rx.plate(3):
            y[t] = rx.Transition(s[t], a_eye)
        rx.tie(s[2], rx.Categorical(np.asarray(goal, dtype=np.float32)))
        return {"s": s, "B": B}

    return pred_model


def _data():
    y = np.full((3, 4), np.nan, dtype=np.float32)
    y[0] = [1.0, 0.0, 0.0, 0.0]
    return y


INIT = {"B": rx.dists.DirichletCollection(np.ones((4, 4), dtype=np.float32))}


def test_unfactorized_data_structured_prediction():
    """Reference conformance: probvec of the middle prediction after 10 VMP
    iterations (inference_tests.jl:1709-1723) and entropy(pred) == entropy(q_s)."""
    res = rx.infer(returnvars=rx.KeepLast(), 
        model=make_pred_model([0.0, 0.0, 1.0, 0.0]),
        data={"y": rx.UnfactorizedData(_data())},
        initialization=INIT,
        iterations=10,
        free_energy=True,
        predictvars=["y"],
    )
    fe = np.asarray(res.free_energy)
    assert np.isfinite(fe).all()
    assert (np.diff(fe) <= 1e-5).all(), fe  # monotone with the goal-prior factor
    pred = np.asarray(res.predictions["y"].probs())[1]
    ref = [0.25160378360439883, 0.20140807577024974,
           0.3455800648551016, 0.20140807577024974]
    np.testing.assert_allclose(pred, ref, rtol=2e-5, atol=2e-5)

    q_s2 = np.asarray(res.posteriors["s"].probs())[1]
    assert abs(_entropy(pred) - _entropy(q_s2)) < 1e-5


def test_default_prediction_is_meanfield_overconfident():
    """Without UnfactorizedData the prediction is the mean-field (geometric
    average) out-message — strictly lower entropy than the state posterior
    (the reference's 'underestimates variance' case)."""
    res = rx.infer(returnvars=rx.KeepLast(), 
        model=make_pred_model([0.0, 1.0, 0.0, 0.0]),
        data={"y": _data()},
        initialization=INIT,
        iterations=10,
        predictvars=["y"],
    )
    pred = np.asarray(res.predictions["y"].probs())[1]
    q_s2 = np.asarray(res.posteriors["s"].probs())[1]
    assert _entropy(pred) < _entropy(q_s2)


def test_unfactorized_gaussian_prediction_unchanged():
    """For conjugate Gaussian likelihoods the structured prediction already IS
    the default (mean = E[x], cov = R + Var[x]); UnfactorizedData must accept
    the wrapper and produce the identical result."""
    rng = np.random.default_rng(3)
    y = rng.standard_normal(50).astype(np.float32)
    y[10:15] = np.nan

    @rx.model
    def iid(y):
        mu = rx.Normal(mean=0.0, var=100.0)
        for i in rx.plate(len(y)):
            y[i] = rx.Normal(mean=mu, var=1.0)
        return {"mu": mu}

    r1 = rx.infer(model=iid, data={"y": y}, predictvars=["y"])
    r2 = rx.infer(model=iid, data={"y": rx.UnfactorizedData(y)},
                  predictvars=["y"])
    np.testing.assert_allclose(
        np.asarray(r1.predictions["y"].mean()),
        np.asarray(r2.predictions["y"].mean()), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(r1.predictions["y"].var()),
        np.asarray(r2.predictions["y"].var()), rtol=1e-6)
