"""Test configuration: force an 8-device virtual CPU backend.

This is the JAX substitute for a multi-chip harness (SURVEY.md §4): sharding /
mesh logic is exercised single-process over 8 virtual CPU devices. Must run
before jax initializes its backends, hence the env mutation at import time.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU default
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# jax may already be preloaded by the interpreter (this image preloads it with
# JAX_PLATFORMS=axon); switching config before the first backend use still works.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import sys
import pytest  # noqa: E402

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    """Golden-parity tests compare against the original torch reference when
    it is mounted (dev machines). They are skipped elsewhere; the numeric
    closed-form tests carry the correctness load on their own."""
    try:
        import torch  # noqa: F401
    except Exception:
        return False
    return os.path.isdir(REFERENCE_ROOT)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="torch reference repo not available"
)


@pytest.fixture(scope="session")
def reference_path():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return REFERENCE_ROOT
