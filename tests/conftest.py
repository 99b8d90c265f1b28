"""Test configuration: force CPU with 8 virtual devices.

Multi-chip hardware is not available in CI; sharding is validated on a
virtual 8-device CPU mesh (see SURVEY.md §4: the multi-host test
strategy the reference lacks entirely).

The environment may pre-import jax with a TPU plugin via sitecustomize,
so an env-var-only override is not enough — we set the platform through
jax.config (which wins as long as no backend op ran yet) and inject the
host-device-count XLA flag before first backend initialization.
"""
import os

if os.environ.get("YDORB_TEST_TPU", "0") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
