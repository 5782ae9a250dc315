"""Streaming inference across the mesh (round-5 mandate: BASELINE config 5 —
parallel independent LGSSM chains, continuous batching, engine-reachable).

``rx.infer(datastream=..., autoupdates=..., batched=True/mesh=...)`` runs B
independent streams in lockstep: the model describes ONE stream, the per-tick
program is vmapped over the leading batch axis, and with a mesh the batch
shards along ``mesh_axis`` via shard_map (pure DP — zero collectives in
steady state).  Reference semantics preserved per tick:
/root/reference/src/inference/streaming.jl:311-436."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

import rxinfer_tpu as rx

D = 2
THETA = np.pi / 20
A = np.array(
    [[np.cos(THETA), -np.sin(THETA)], [np.sin(THETA), np.cos(THETA)]],
    dtype=np.float32,
)
Q = 0.5 * np.eye(D, dtype=np.float32)
R = np.eye(D, dtype=np.float32)


def _step_model():
    @rx.model
    def step(y, pm, pc):
        x = rx.MvNormal(mean=pm, cov=pc)
        y.observe(rx.MvNormal(mean=x, cov=R))
        return {"x": x}

    return step


def _au(batch=None):
    """Posterior → next prior prediction step.  Batched mappings operate on
    the batch-leading posterior parameters (einsum over the trailing dims)."""
    if batch is None:
        initial = {"pm": np.zeros(D, np.float32),
                   "pc": 25 * np.eye(D, dtype=np.float32)}
        return rx.autoupdates(
            initial=initial,
            pm=lambda q: A @ q["x"].mean(),
            pc=lambda q: A @ q["x"].cov() @ A.T + Q,
        )
    initial = {
        "pm": np.zeros((batch, D), np.float32),
        "pc": np.broadcast_to(25 * np.eye(D, dtype=np.float32),
                              (batch, D, D)).copy(),
    }
    return rx.autoupdates(
        initial=initial,
        pm=lambda q: jnp.einsum("ij,bj->bi", A, q["x"].mean()),
        pc=lambda q: jnp.einsum(
            "ij,bjk,lk->bil", A, q["x"].cov(), A) + Q,
    )


def _data(B, T, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((T, B, D)).astype(np.float32)


def test_batched_on_next_matches_single_streams():
    B, T = 4, 12
    ys = _data(B, T)
    eng_b = rx.infer(model=_step_model(), datastream=None,
                     autoupdates=_au(B), batched=True)
    for t in range(T):
        eng_b.on_next({"y": ys[t]})
    mb = np.asarray(eng_b.posteriors["x"].mean())        # (B, D)
    vb = np.asarray(eng_b.posteriors["x"].cov())         # (B, D, D)

    for b in range(B):
        eng_1 = rx.infer(model=_step_model(), datastream=None,
                         autoupdates=_au())
        for t in range(T):
            eng_1.on_next({"y": ys[t, b]})
        np.testing.assert_allclose(
            mb[b], np.asarray(eng_1.posteriors["x"].mean()),
            rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(
            vb[b], np.asarray(eng_1.posteriors["x"].cov()),
            rtol=2e-5, atol=2e-5)


def test_mesh_on_next_matches_unsharded():
    B, T = 8, 10
    ys = _data(B, T, seed=1)
    mesh = Mesh(np.array(jax.devices()), ("dp",))

    eng_m = rx.infer(model=_step_model(), datastream=None,
                     autoupdates=_au(B), mesh=mesh)
    eng_b = rx.infer(model=_step_model(), datastream=None,
                     autoupdates=_au(B), batched=True)
    for t in range(T):
        eng_m.on_next({"y": ys[t]})
        eng_b.on_next({"y": ys[t]})
    np.testing.assert_array_equal(
        np.asarray(eng_m.posteriors["x"].mean()),
        np.asarray(eng_b.posteriors["x"].mean()))
    np.testing.assert_array_equal(
        np.asarray(eng_m.posteriors["x"].cov()),
        np.asarray(eng_b.posteriors["x"].cov()))


def test_mesh_run_offline_matches_unsharded():
    B, T = 16, 20
    ys = _data(B, T, seed=2)
    mesh = Mesh(np.array(jax.devices()), ("dp",))

    eng_m = rx.infer(model=_step_model(), datastream=None,
                     autoupdates=_au(B), mesh=mesh, free_energy=True)
    posts_m, fes_m = eng_m.run_offline({"y": ys})

    eng_b = rx.infer(model=_step_model(), datastream=None,
                     autoupdates=_au(B), batched=True, free_energy=True)
    posts_b, fes_b = eng_b.run_offline({"y": ys})

    np.testing.assert_allclose(np.asarray(posts_m["x"].mean()),
                               np.asarray(posts_b["x"].mean()),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fes_m), np.asarray(fes_b),
                               rtol=1e-6, atol=1e-6)
    assert np.asarray(fes_m).shape == (T, B, 1)
    assert np.isfinite(np.asarray(fes_m)).all()


def test_offline_batched_matches_on_next():
    B, T = 4, 8
    ys = _data(B, T, seed=3)
    eng_o = rx.infer(model=_step_model(), datastream=None,
                     autoupdates=_au(B), batched=True)
    posts, _ = eng_o.run_offline({"y": ys})

    eng_n = rx.infer(model=_step_model(), datastream=None,
                     autoupdates=_au(B), batched=True)
    for t in range(T):
        eng_n.on_next({"y": ys[t]})
    np.testing.assert_allclose(
        np.asarray(posts["x"].mean())[-1],
        np.asarray(eng_n.posteriors["x"].mean()),
        rtol=1e-5, atol=1e-5)


def test_mesh_indivisible_batch_raises():
    B, T = 6, 3
    ys = _data(B, T, seed=4)
    mesh = Mesh(np.array(jax.devices()), ("dp",))
    eng = rx.infer(model=_step_model(), datastream=None,
                   autoupdates=_au(B), mesh=mesh)
    with pytest.raises(ValueError, match="divisible"):
        eng.on_next({"y": ys[0]})


def test_fused_stream_plan_activates_and_matches():
    """Round-5 fused streaming plan: the linear-Gaussian filtering tick is
    probed (engine/stream_plan.py) and the whole stream runs through the
    entrywise filter machine; results must match the generic path."""
    B, T = 8, 24
    ys = _data(B, T, seed=9)
    eng = rx.infer(model=_step_model(), datastream=None,
                   autoupdates=_au(B), batched=True)
    posts, _ = eng.run_offline({"y": ys})
    assert eng._stream_plan, "fused stream plan should have activated"
    np.testing.assert_allclose(np.asarray(eng._stream_plan.F), A,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(eng._stream_plan.Q), Q,
                               rtol=1e-4, atol=1e-4)

    # generic path oracle: free_energy=True disables the plan
    eng_g = rx.infer(model=_step_model(), datastream=None,
                     autoupdates=_au(B), batched=True, free_energy=True)
    posts_g, _ = eng_g.run_offline({"y": ys})
    assert eng_g._stream_plan is None
    np.testing.assert_allclose(np.asarray(posts["x"].mean()),
                               np.asarray(posts_g["x"].mean()),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(posts["x"].cov()),
                               np.asarray(posts_g["x"].cov()),
                               rtol=2e-4, atol=2e-4)


def test_fused_stream_plan_mesh_matches():
    B, T = 16, 12
    ys = _data(B, T, seed=10)
    mesh = Mesh(np.array(jax.devices()), ("dp",))
    eng_m = rx.infer(model=_step_model(), datastream=None,
                     autoupdates=_au(B), mesh=mesh)
    posts_m, _ = eng_m.run_offline({"y": ys})
    assert eng_m._stream_plan
    eng_u = rx.infer(model=_step_model(), datastream=None,
                     autoupdates=_au(B), batched=True)
    posts_u, _ = eng_u.run_offline({"y": ys})
    np.testing.assert_allclose(np.asarray(posts_m["x"].mean()),
                               np.asarray(posts_u["x"].mean()),
                               rtol=1e-6, atol=1e-6)
    # engine.args advanced identically (the next-tick prediction)
    np.testing.assert_allclose(np.asarray(eng_m.args["pm"]),
                               np.asarray(eng_u.args["pm"]),
                               rtol=1e-6, atol=1e-6)


def test_fused_stream_plan_falls_back_on_nonlinear_autoupdates():
    B, T = 4, 6
    ys = _data(B, T, seed=11)
    au = rx.autoupdates(
        initial={"pm": np.zeros((B, D), np.float32),
                 "pc": np.broadcast_to(25 * np.eye(D, dtype=np.float32),
                                       (B, D, D)).copy()},
        pm=lambda q: jnp.tanh(q["x"].mean()),        # NOT affine
        pc=lambda q: jnp.einsum("ij,bjk,lk->bil", A, q["x"].cov(), A) + Q,
    )
    eng = rx.infer(model=_step_model(), datastream=None, autoupdates=au,
                   batched=True)
    posts, _ = eng.run_offline({"y": ys})
    assert eng._stream_plan is False  # probed, rejected -> generic path
    assert np.isfinite(np.asarray(posts["x"].mean())).all()
