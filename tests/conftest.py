"""Test configuration: force a virtual 8-device CPU mesh so sharding tests
run without real multi-chip hardware (the driver separately dry-runs the
multi-chip path)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402

REFERENCE = "/root/reference"


def reference_stream(name: str) -> str:
    for sub in ("roundtriptest", "res"):
        p = os.path.join(REFERENCE, sub, name)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(name)


@pytest.fixture
def black_264():
    return reference_stream("black.264")


@pytest.fixture
def tibby_264():
    return reference_stream("tibby.264")
