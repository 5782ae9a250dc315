"""Quantized message kernels (Pallas): int8 observation payloads with per-row
scales, dequantized and contracted against the emission operator in one fused
MXU kernel.

BASELINE.json north star: "message payloads run in bf16 with fp32 accumulation
plus optional int8/fp8 quantized natural parameters … every dequant+matmul-style
message kernel must hit speed-of-light per chip."  The evidence projection
xi = (y ⊘ scale) @ (R^{-1} H)^T is the dequant+matmul of this workload: for B
chains it is a (B, dy) × (dy, dx) matmul — the only MXU-shaped op in the
filtering path — and the int8 payload halves/quarters the HBM traffic of
streaming observation ingest.

Kernels run compiled on TPU and in interpreter mode on CPU (tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only module; absent on CPU builds
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _spec(block=None, index_map=None):
    kwargs = {}
    if _VMEM is not None:
        kwargs["memory_space"] = _VMEM
    if block is not None:
        return pl.BlockSpec(block, index_map, **kwargs)
    return pl.BlockSpec(**kwargs)


# ---------------------------------------------------------------------------------
# Quantization: per-row int8 with fp32 scales
# ---------------------------------------------------------------------------------

def _quantize_kernel(x_ref, vals_ref, scales_ref):
    x = x_ref[:]
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.clip(absmax, 1e-12) / 127.0
    scales_ref[:] = scale
    q = jnp.clip(jnp.round(x / scale), -127, 127)
    vals_ref[:] = q.astype(jnp.int8)


def _gridded_quantize(kernel, x, out_dtype, block_rows=None):
    """Row-blocked pallas_call for the quantize kernels: big payloads (engine
    ingest is (B·T, dy) or (B, T) shaped) stream through VMEM in
    ``block_rows``-row tiles; rows are zero-padded to a whole number of
    blocks and the pad sliced off (a zero row quantizes to zeros/scale
    1e-12/M — harmless)."""
    b, d = x.shape
    if block_rows is None:
        # ~2 MB of fp32 input per tile: wide rows (scalar-obs (B, T) layout)
        # get few rows per block, narrow rows (B·T, dy) get many
        block_rows = max(8, min(4096, (1 << 19) // max(d, 1)))
    # TPU lowering requires the block's sublane dim to be a multiple of 8
    # (unless it equals the full array dim)
    block_rows = max(8, (block_rows // 8) * 8)
    if b <= block_rows:
        block_rows = b
        padded = x
    elif b % block_rows == 0:
        padded = x
    else:
        pad = block_rows - b % block_rows
        padded = jnp.concatenate(
            [x, jnp.zeros((pad, d), x.dtype)], axis=0)
    bp = padded.shape[0]
    vals, scales = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bp, d), out_dtype),
            jax.ShapeDtypeStruct((bp, 1), jnp.float32),
        ),
        grid=(bp // block_rows,),
        in_specs=[_spec((block_rows, d), lambda i: (i, 0))],
        out_specs=(_spec((block_rows, d), lambda i: (i, 0)),
                   _spec((block_rows, 1), lambda i: (i, 0))),
        interpret=_interpret(),
    )(padded)
    return vals[:b], scales[:b]


def quantize_rows(x: jnp.ndarray, block_rows=None):
    """Per-row symmetric int8 quantization: x ≈ vals * scales."""
    return _gridded_quantize(_quantize_kernel, x, jnp.int8, block_rows)


# ---------------------------------------------------------------------------------
# Fused dequant + matmul: xi = (vals * scales) @ W^T
# ---------------------------------------------------------------------------------

def _dequant_matmul_kernel(vals_ref, scales_ref, w_ref, out_ref):
    v = vals_ref[:].astype(jnp.float32) * scales_ref[:]
    out_ref[:] = jnp.dot(v, w_ref[:], preferred_element_type=jnp.float32)


def dequant_matmul(vals: jnp.ndarray, scales: jnp.ndarray, w: jnp.ndarray,
                   block_b: int = 512):
    """xi = dequant(vals, scales) @ w, fused in one VMEM-resident kernel.

    vals: (B, dy) int8; scales: (B, 1) fp32; w: (dy, dx) fp32 → (B, dx) fp32."""
    b, dy = vals.shape
    dx = w.shape[1]
    if b % block_b != 0:
        # pad to a whole number of blocks (tiny B: single block)
        block_b = b
    grid = (b // block_b,)
    return pl.pallas_call(
        _dequant_matmul_kernel,
        out_shape=jax.ShapeDtypeStruct((b, dx), jnp.float32),
        grid=grid,
        in_specs=[
            _spec((block_b, dy), lambda i: (i, 0)),
            _spec((block_b, 1), lambda i: (i, 0)),
            _spec((dy, dx), lambda i: (0, 0)),
        ],
        out_specs=_spec((block_b, dx), lambda i: (i, 0)),
        interpret=_interpret(),
    )(vals, scales, w)


def quantized_evidence(y: jnp.ndarray, hr_t: jnp.ndarray):
    """Quantize a batch of observations and project to information-form evidence
    xi = y_q @ (R^{-1}H)^T — the streaming-ingest message kernel."""
    vals, scales = quantize_rows(y)
    return dequant_matmul(vals, scales, hr_t)


# ---------------------------------------------------------------------------------
# fp8 (e4m3) payload variant — BASELINE.json "optional int8/fp8 quantized
# natural parameters".  fp8 keeps ~2 decimal digits with a much wider dynamic
# range per row than int8; the same per-row scale keeps outliers exact.
# ---------------------------------------------------------------------------------

_FP8_MAX = 448.0  # e4m3 finite max


def _quantize_fp8_kernel(x_ref, vals_ref, scales_ref):
    x = x_ref[:]
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.clip(absmax, 1e-12) / _FP8_MAX
    scales_ref[:] = scale
    vals_ref[:] = (x / scale).astype(jnp.float8_e4m3fn)


def quantize_rows_fp8(x: jnp.ndarray, block_rows=None):
    """Per-row scaled fp8(e4m3) quantization: x ≈ vals * scales."""
    return _gridded_quantize(_quantize_fp8_kernel, x, jnp.float8_e4m3fn,
                             block_rows)


def quantized_evidence_fp8(y: jnp.ndarray, hr_t: jnp.ndarray):
    """fp8-payload evidence projection (same contract as quantized_evidence)."""
    vals, scales = quantize_rows_fp8(y)
    return dequant_matmul(vals, scales, hr_t)
