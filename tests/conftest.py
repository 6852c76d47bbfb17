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
