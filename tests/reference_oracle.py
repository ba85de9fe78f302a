"""Test-only access to the mounted reference implementation as an oracle.

The upstream VF-NeRF repo (read-only at /root/reference) is plain
Python/PyTorch and runs on CPU, so parity tests import its modules and compare
our JAX ops against its outputs bit-close. Production code never touches this;
tests skip cleanly when the mount is absent.
"""

import os
import sys

REFERENCE_PATH = os.environ.get("VFNERF_REFERENCE_PATH", "/root/reference")


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "models"))


def add_reference_to_path() -> None:
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
