"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This environment ships a sitecustomize.py that registers a remote-TPU
("axon") PJRT backend at interpreter startup, so JAX_PLATFORMS from the
environment is decided before conftest runs. ``jax.config.update`` after
import still wins -- use that. XLA_FLAGS must be in the env before the CPU
backend initializes (lazily, at first device query), which is the case
here.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
