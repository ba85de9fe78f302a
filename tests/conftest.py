"""Test harness: run everything on a virtual 8-device CPU mesh.

SURVEY.md §4.4: distributed tests fake an 8-device mesh on CPU via
``--xla_force_host_platform_device_count``. The XLA flag must be set before
jax initializes backends. NOTE: this environment's sitecustomize pins
``jax_platforms`` to "axon,cpu" (TPU-first) via ``jax.config`` — the env var
alone does not override it, so we update the config after import.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
# Persistent compile cache across test runs (compiles dominate suite time).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/vf_nerf_tpu_xla_tests"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


import sys
from pathlib import Path

# tools/ holds study drivers whose pure helpers are unit-tested
# (convergence gate, joint-efficacy pose metrics).
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: minutes-long protocol tests (deselect with -m 'not slow')")
