"""Suppress persistent compile-cache WRITES for mesh/shard_map tests.

XLA's executable serializer ABORTS/SEGFAULTS serializing shard_map programs
that embed Pallas custom calls on the CPU backend (put_executable crashes
that killed the whole suite mid-run — round 4).  ``jax_enable_compilation_
cache`` cannot be toggled mid-process (the decision is latched on first
use), but the min-compile-time threshold is read at every write — raising
it to infinity skips all writes while leaving (safe, same-machine) cache
READS intact."""

import jax
import pytest


@pytest.fixture(autouse=True)
def _no_persistent_cache_writes():
    prev = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    yield
    jax.config.update("jax_persistent_cache_min_compile_time_secs", prev)
