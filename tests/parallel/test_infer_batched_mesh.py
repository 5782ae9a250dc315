"""Data-parallel infer_batched over a device mesh (shard_map around the
batched program; SURVEY §2.3 strategy 1 — independent graphs are
embarrassingly parallel across ICI)."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

import rxinfer_tpu as rx
from rxinfer_tpu.dists import DirichletCollection
from rxinfer_tpu.models import zoo


def _lgssm_gen(d=2):
    A = np.array([[0.98, -0.1], [0.1, 0.98]], np.float32)
    return zoo.lgssm(A, np.eye(d, dtype=np.float32),
                     np.eye(d, dtype=np.float32),
                     0.5 * np.eye(d, dtype=np.float32),
                     np.zeros(d, np.float32),
                     10 * np.eye(d, dtype=np.float32))


def _mesh(n=8):
    return Mesh(np.asarray(jax.devices()[:n]), ("dp",))


def test_mesh_lgssm_matches_unsharded_bitwise():
    gen = _lgssm_gen()
    rng = np.random.default_rng(0)
    y = rng.standard_normal((16, 40, 2)).astype(np.float32)

    pm, fm = rx.infer_batched(gen, {"y": y}, iterations=2, free_energy=True,
                              mesh=_mesh())
    pu, fu = rx.infer_batched(gen, {"y": y}, iterations=2, free_energy=True)
    np.testing.assert_array_equal(np.asarray(pm["x"].mean()),
                                  np.asarray(pu["x"].mean()))
    np.testing.assert_array_equal(np.asarray(fm), np.asarray(fu))
    assert np.asarray(fm).shape == (2, 16)


def test_mesh_hmm_discrete_kernel_path():
    rng = np.random.default_rng(1)
    B, T = 8, 30
    yh = rng.integers(0, 3, size=(B, T))
    y1 = np.eye(3, dtype=np.float32)[yh]
    init = {"A": DirichletCollection(np.full((3, 3), 1.0, np.float32)),
            "B": DirichletCollection(np.float32(np.eye(3) * 5.0 + 1.0))}

    pm, fm = rx.infer_batched(zoo.hmm(3, 3), {"y": y1}, iterations=4,
                              free_energy=True, initialization=init,
                              mesh=_mesh())
    pu, fu = rx.infer_batched(zoo.hmm(3, 3), {"y": y1}, iterations=4,
                              free_energy=True, initialization=init)
    np.testing.assert_allclose(np.asarray(pm["A"].alpha),
                               np.asarray(pu["A"].alpha), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fm), np.asarray(fu), atol=1e-4)


def test_mesh_keep_each_history():
    gen = _lgssm_gen()
    rng = np.random.default_rng(2)
    y = rng.standard_normal((8, 20, 2)).astype(np.float32)
    pm, _ = rx.infer_batched(gen, {"y": y}, iterations=3,
                             returnvars=rx.KeepEach(), mesh=_mesh())
    pu, _ = rx.infer_batched(gen, {"y": y}, iterations=3,
                             returnvars=rx.KeepEach())
    assert isinstance(pm["x"], list) and len(pm["x"]) == 3
    np.testing.assert_array_equal(np.asarray(pm["x"][-1].mean()),
                                  np.asarray(pu["x"][-1].mean()))


def test_mesh_batch_must_divide_axis():
    gen = _lgssm_gen()
    y = np.zeros((6, 10, 2), np.float32)  # 6 % 8 != 0
    with pytest.raises(ValueError, match="must be divisible"):
        rx.infer_batched(gen, {"y": y}, iterations=1, mesh=_mesh())
