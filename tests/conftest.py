"""Test configuration: force CPU backend with 8 virtual devices so multi-chip
sharding paths are testable without TPU hardware (SURVEY.md §4 implication).

Note: the environment's axon sitecustomize calls ``jax.config.update("jax_platforms",
"axon,cpu")`` in every process, so the env var alone is not enough — we must update
the config *before* any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compile cache: the suite is compile-dominated (~6 min cold);
# warm reruns drop most of it
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()
