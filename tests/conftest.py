"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4 "Distributed without a cluster": JAX's
``xla_force_host_platform_device_count`` gives 8 fake CPU devices so the real
mesh/pjit/FSDP code paths run single-process in CI.

Note: the dev image preimports jax via a sitecustomize hook, so env vars set
here are too late for ``JAX_PLATFORMS``; we steer the backend through
``jax.config.update`` instead (XLA_FLAGS is still read at first backend use,
which has not happened yet at conftest time).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite is compile-dominated (every
# test jits small graphs), so warm CI runs cut wall time ~in half. Keyed on
# HLO, so code changes invalidate exactly the affected entries.
_cache_dir = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache_tests")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


# ---------------------------------------------------------------------------
# Per-module executable eviction: keep the process under vm.max_map_count.
#
# Root cause of the round-3 "serial full suite dies natively 4-9 tests from
# the end" (VERDICT r3 item 1): every compiled XLA:CPU executable holds
# mmap'd JIT code + buffers, and the ~450 distinct jit compilations of a
# full serial run accumulate ~64k memory mappings — right through Linux's
# default vm.max_map_count = 65530. When mmap() starts failing, native code
# inside XLA/zstd segfaults instead of raising (measured: 5/5 crashes at
# maps = 64k-65k, in both compilation-cache *read* and *write* frames;
# subsets pass because a fresh process starts at ~400 maps). Dropping
# executable references releases the maps (measured 995 -> 517 after
# jax.clear_caches() + gc in a 40-jit probe), so evicting per test module
# caps the high-water mark far below the limit. Re-compiles in later
# modules warm-start from the persistent cache above, so the wall-time
# cost is small. Full writeup: DESIGN.md "Serial-suite native crash".
# ---------------------------------------------------------------------------

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _evict_jit_executables_per_module():
    yield
    jax.clear_caches()
    gc.collect()
