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
