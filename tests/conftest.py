"""Test configuration.

Multi-device sharding tests use an 8-device virtual CPU mesh (SURVEY.md §4).
NOTE: in this environment the axon TPU plugin pins jax_platforms via
jax.config at interpreter start (sitecustomize), so the JAX_PLATFORMS env
var alone does not stick — and merely calling jax.devices("cpu") would
initialize EVERY registered platform, including the tunneled TPU plugin,
whose client init can block forever when the tunnel is down (observed).
config.update below wins over the sitecustomize pin and keeps the whole
suite hermetic: every test pins the cpu backend anyway (f64 math is only
bit-exact there).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

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
