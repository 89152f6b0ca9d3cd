"""Test config: force an 8-device virtual CPU backend before jax initializes
its backends.

Note: this environment pre-imports jax via sitecustomize, so JAX_PLATFORMS
must be set through jax.config (env vars are read at import time).  XLA_FLAGS
is still honored because backends initialize lazily.

Multi-chip sharding tests run on jax's faked multi-device CPU platform
(the reference cannot fake a cluster at all — its distributed path needs
>=2 real GPUs; SURVEY.md §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    """2x4 (data, expert) mesh over the 8 virtual CPU devices."""
    import numpy as np
    from jax.sharding import Mesh

    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devices, ("data", "expert"))
