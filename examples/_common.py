"""Shared helper: run examples on CPU by default (fast startup anywhere);
set RXINFER_TPU_EXAMPLES_DEVICE=tpu to use the real chip."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("RXINFER_TPU_EXAMPLES_DEVICE", "cpu") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")
