"""Smoke-run the fastest example scripts (protects the demo surface)."""

import os
import subprocess
import sys

import pytest

_EX = os.path.join(os.path.dirname(__file__), "..", "examples")


@pytest.mark.parametrize("script,expect", [
    ("01_coin_flip.py", "posterior Beta"),
    ("03_unknown_mean_precision.py", "free energy decreased monotonically: True"),
    ("06_streaming.py", "offline scan matches: True"),
    ("09_mixture_model_selection.py", "model selection favours believer: True"),
    ("10_latent_ar.py", "free energy decreased monotonically: True"),
])
def test_example_runs(script, expect):
    env = dict(os.environ, RXINFER_TPU_EXAMPLES_DEVICE="cpu")
    out = subprocess.run(
        [sys.executable, script], cwd=_EX, env=env,
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert expect in out.stdout, out.stdout
