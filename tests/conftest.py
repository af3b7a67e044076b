"""Test configuration.

Multi-device sharding tests use an 8-device virtual CPU mesh (SURVEY.md §4).
NOTE: in this environment the axon TPU plugin ignores JAX_PLATFORMS, so we
cannot globally select the cpu platform; instead jax's coexisting cpu
backend is used explicitly (jax.devices("cpu") + jax.default_device) by the
fixtures below. f64 math is only bit-exact on the cpu backend.
"""
import os

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


@pytest.fixture
def cpu_devices():
    import schwarzwald_tpu  # noqa: F401 (x64)
    import jax

    try:
        return jax.devices("cpu")
    except RuntimeError:
        pytest.skip("no cpu backend available")


@pytest.fixture
def on_cpu(cpu_devices):
    """Run the test body with the cpu backend as default device."""
    import jax

    with jax.default_device(cpu_devices[0]):
        yield cpu_devices
