"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize imports jax and registers the TPU (axon)
PJRT plugin before pytest starts, so env-var overrides are too late;
``jax.config.update`` still works because no backend has been initialised
yet at conftest-import time.
"""

import os

# Must be appended before the first backend initialisation.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (already imported by sitecustomize; config still mutable)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
