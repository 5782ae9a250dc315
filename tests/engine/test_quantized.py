"""Quantized message kernels (Pallas, interpreter mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from rxinfer_tpu.ops.quantized import dequant_matmul, quantize_rows, quantized_evidence


def test_quantize_roundtrip():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((64, 8)) * np.exp(rng.uniform(-3, 3, (64, 1)))).astype(np.float32)
    vals, scales = quantize_rows(jnp.asarray(x))
    x_hat = np.asarray(vals, np.float32) * np.asarray(scales)
    rel = np.abs(x_hat - x) / np.abs(x).max(axis=1, keepdims=True)
    assert rel.max() < 1 / 127 + 1e-3


def test_dequant_matmul_matches_fp32():
    rng = np.random.default_rng(1)
    b, dy, dx = 128, 8, 4
    y = rng.standard_normal((b, dy)).astype(np.float32)
    w = rng.standard_normal((dy, dx)).astype(np.float32)
    vals, scales = quantize_rows(jnp.asarray(y))
    out = dequant_matmul(vals, scales, jnp.asarray(w))
    ref = (np.asarray(vals, np.float32) * np.asarray(scales)) @ w
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)
    # end-to-end error vs unquantized stays at int8 level
    exact = y @ w
    err = np.abs(np.asarray(out) - exact).max()
    assert err < 0.05 * np.abs(exact).max()


def test_quantized_evidence_pipeline():
    rng = np.random.default_rng(2)
    b, d = 256, 4
    y = rng.standard_normal((b, d)).astype(np.float32)
    h = 1.3 * np.eye(d, dtype=np.float32)
    r = np.eye(d, dtype=np.float32)
    hr_t = (np.linalg.inv(r) @ h).T.astype(np.float32)
    xi = quantized_evidence(jnp.asarray(y), jnp.asarray(hr_t))
    exact = y @ hr_t
    assert np.abs(np.asarray(xi) - exact).max() < 0.05 * np.abs(exact).max()


def test_fp8_quantize_roundtrip_and_evidence():
    """fp8(e4m3) payload path (BASELINE: optional int8/fp8 natural params)."""
    from rxinfer_tpu.ops.quantized import quantize_rows_fp8, quantized_evidence_fp8

    rng = np.random.default_rng(3)
    b, d = 128, 4
    y = (10.0 * rng.standard_normal((b, d))).astype(np.float32)
    vals, scales = quantize_rows_fp8(jnp.asarray(y))
    assert vals.dtype == jnp.float8_e4m3fn
    recon = np.asarray(vals, np.float32) * np.asarray(scales)
    # e4m3 keeps ~2 significant digits
    assert np.abs(recon - y).max() < 0.07 * np.abs(y).max()

    h = 1.3 * np.eye(d, dtype=np.float32)
    hr_t = h.T.astype(np.float32)
    xi = quantized_evidence_fp8(jnp.asarray(y), jnp.asarray(hr_t))
    exact = y @ hr_t
    assert np.abs(np.asarray(xi) - exact).max() < 0.07 * np.abs(exact).max()


def test_gridded_quantize_non_divisible_rows():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((777, 6)).astype(np.float32)
    vals, scales = quantize_rows(jnp.asarray(x), block_rows=128)
    assert vals.shape == (777, 6) and scales.shape == (777, 1)
    x_hat = np.asarray(vals, np.float32) * np.asarray(scales)
    assert np.abs(x_hat - x).max() < (np.abs(x).max(axis=1) / 127).max() + 1e-5


def _lgssm_batch(B=8, T=64, d=2, seed=5):
    import rxinfer_tpu as rx

    rng = np.random.default_rng(seed)
    F = np.array([[0.99, -0.1], [0.1, 0.99]], np.float32)[:d, :d]
    y = rng.standard_normal((B, T, d)).astype(np.float32) * 3.0

    @rx.model
    def m(y):
        T_ = len(y)
        x = rx.latent(T_, name="x")
        x[0] = rx.MvNormal(mean=np.zeros(d, np.float32),
                           cov=25.0 * np.eye(d, dtype=np.float32))
        for t in rx.plate(1, T_):
            x[t] = rx.MvNormal(mean=F @ x[t - 1],
                               cov=np.eye(d, dtype=np.float32))
        for t in rx.plate(T_):
            y[t] = rx.MvNormal(mean=x[t], cov=np.eye(d, dtype=np.float32))
        return {"x": x}

    return m, y


def test_engine_observation_dtype_int8():
    """options={"observation_dtype": "int8"}: the fused linear-evidence path
    ingests quantized payloads; the posterior must (a) be close to the fp32
    run at int8 tolerance, and (b) EXACTLY match the fp32 engine run on the
    pre-dequantized observations (consistent inference on quantized ŷ)."""
    import rxinfer_tpu as rx
    from rxinfer_tpu.ops.quantized import quantize_rows

    m, y = _lgssm_batch()
    B, T, d = y.shape
    p_fp32, fe_fp32 = rx.infer_batched(m, {"y": y}, iterations=2,
                                       free_energy=True)
    p_q, fe_q = rx.infer_batched(m, {"y": y}, iterations=2, free_energy=True,
                                 options={"observation_dtype": "int8"})
    mu_f = np.asarray(p_fp32["x"].mean())
    mu_q = np.asarray(p_q["x"].mean())
    # int8-level agreement with the fp32 run
    assert np.abs(mu_q - mu_f).max() < 0.05 * np.abs(mu_f).max()
    assert np.isfinite(np.asarray(fe_q)).all()

    # consistency: fp32 engine on ŷ == int8 engine on y (quantization axis
    # is TIME, one scale per (chain, channel) — see engine/batched.py)
    rows = y.transpose(0, 2, 1).reshape(B * d, T)
    vals, scales = quantize_rows(jnp.asarray(rows))
    y_hat = (np.asarray(vals, np.float32)
             * np.asarray(scales)).reshape(B, d, T).transpose(0, 2, 1)
    p_hat, fe_hat = rx.infer_batched(m, {"y": y_hat}, iterations=2,
                                     free_energy=True)
    np.testing.assert_allclose(mu_q, np.asarray(p_hat["x"].mean()),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fe_q), np.asarray(fe_hat),
                               rtol=1e-5, atol=1e-4)


def test_engine_observation_dtype_fp8_and_validation():
    import pytest
    import rxinfer_tpu as rx

    m, y = _lgssm_batch(seed=6)
    p_q, _ = rx.infer_batched(m, {"y": y}, iterations=1,
                              options={"observation_dtype": "float8_e4m3fn"})
    p_f, _ = rx.infer_batched(m, {"y": y}, iterations=1)
    mu_f = np.asarray(p_f["x"].mean())
    assert np.abs(np.asarray(p_q["x"].mean()) - mu_f).max() \
        < 0.07 * np.abs(mu_f).max()

    with pytest.raises(ValueError, match="observation_dtype"):
        rx.infer_batched(m, {"y": y}, iterations=1,
                         options={"observation_dtype": "int4"})


def test_observation_dtype_warns_without_fused_plan():
    """A model with no fused linear-evidence plan warns and stays fp32."""
    import warnings

    import rxinfer_tpu as rx
    from rxinfer_tpu.dists import GammaShapeRate

    rng = np.random.default_rng(7)
    y = rng.standard_normal((4, 32)).astype(np.float32)

    @rx.model
    def m(y):
        T_ = len(y)
        tau = rx.Gamma(shape=2.0, rate=2.0)
        x = rx.latent(T_, name="x")
        x[0] = rx.Normal(mean=0.0, var=25.0)
        for t in rx.plate(1, T_):
            x[t] = rx.Normal(mean=x[t - 1], var=1.0)
        for t in rx.plate(T_):
            y[t] = rx.Normal(mean=x[t], precision=tau)
        return {"x": x, "tau": tau}

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        rx.infer_batched(m, {"y": y}, iterations=1,
                         options={"observation_dtype": "int8"},
                         initialization={"tau": GammaShapeRate(2.0, 2.0)})
    assert any("observation_dtype" in str(w.message) for w in rec)
