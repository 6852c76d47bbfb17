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
