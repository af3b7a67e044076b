"""Test configuration: run JAX on an 8-device virtual CPU mesh.

This emulates a multi-chip TPU topology on CPU so sharding/pjit tests run
hermetically (see SURVEY.md §4: multi-device tests via
xla_force_host_platform_device_count).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(20260816)
