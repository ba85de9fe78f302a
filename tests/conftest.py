"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax is imported anywhere (SURVEY.md §4.4:
distributed tests fake an 8-device mesh on CPU via
``--xla_force_host_platform_device_count``).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_enable_x64", False)
