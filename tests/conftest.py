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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in flags:
    # Cap XLA:CPU codegen at AVX2: this host's XLA feature probe is
    # inconsistent with its own codegen targets (cpu_aot_loader logs
    # compile-vs-host mismatches for amx/avx512 pseudo-features), and long
    # suite runs accumulated heap corruption that SEGFAULTED later compiles
    # (round 4).  AVX2-only codegen is slightly slower but stable.
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags

# The full suite JIT-compiles ~1000 XLA programs; LLVM's JIT allocates
# multiple mappings per executable and the process crosses the default
# vm.max_map_count (65530) near the end of the run — mmap then fails inside
# LLVM and the COMPILER segfaults (round 4: crashes at ~85% of every cold
# run, always in backend_compile_and_load).  Best-effort raise; the PRIOR
# value is recorded and restored in pytest_sessionfinish below, and the
# change is logged.  This is a host-global sysctl: set
# RXINFER_NO_RAISE_MAP_COUNT=1 to skip it entirely (long cold runs may then
# segfault in the XLA compiler).
_prev_map_count = None
if not os.environ.get("RXINFER_NO_RAISE_MAP_COUNT"):
    try:
        with open("/proc/sys/vm/max_map_count") as _f:
            _cur = int(_f.read())
        if _cur < 1_048_576:
            with open("/proc/sys/vm/max_map_count", "w") as _f:
                _f.write("1048576")
            _prev_map_count = _cur
            import sys as _sys

            print(
                f"[conftest] raised vm.max_map_count {_cur} -> 1048576 "
                "(restored at session finish; RXINFER_NO_RAISE_MAP_COUNT=1 "
                "to disable)",
                file=_sys.stderr,
            )
    except OSError:
        pass


def pytest_sessionfinish(session, exitstatus):
    if _prev_map_count is not None:
        try:
            with open("/proc/sys/vm/max_map_count", "w") as _f:
                _f.write(str(_prev_map_count))
        except OSError:
            pass

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# NO persistent compile cache for the CPU test suite (round 4): XLA:CPU AOT
# cache round-trips are unreliable on this host — cpu_aot_loader logs
# compile-vs-host machine-feature mismatches (pseudo-features like
# prefer-no-scatter) and the suite intermittently SEGFAULTED/ABORTED inside
# backend_compile_and_load / put_executable once cache artifacts were in
# play.  Cold compiles cost ~20 min/run on this 2-core box but are correct.
# (bench.py keeps its own cache: the axon/TPU backend compiles remotely and
# never touches the CPU AOT serializer.)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()
