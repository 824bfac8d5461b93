"""Pytest setup: force an 8-fake-device CPU mesh so every test (including
sharding/collective tests) runs without TPU hardware (SURVEY.md section 4
item 4).

This container's sitecustomize imports jax and initializes the real-TPU
"axon" backend at interpreter startup (JAX_PLATFORMS=axon is pinned in the
environment), so merely setting env vars here is too late: we must flip the
jax config and clear the cached backend so the next lookup re-initializes on
CPU with the fake-device flag.
"""

import os
import sys

# SEEKMER_TEST_TPU=1 runs the suite on whatever backend the container
# provides (the real chip) — used for TPU-only numerics smoke runs.
_USE_TPU = os.environ.get("SEEKMER_TEST_TPU") == "1"

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
    from jax._src import xla_bridge as _xb

    if (_xb._default_backend is not None
            and _xb._default_backend.platform != "cpu"):
        _xb._clear_backends()
        _xb.get_backend.cache_clear()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def pytest_sessionstart(session):
    if _USE_TPU:
        return
    devices = jax.devices()
    assert devices[0].platform == "cpu", f"tests must run on CPU: {devices}"
    assert len(devices) == 8, f"expected 8 fake devices: {devices}"
