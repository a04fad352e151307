"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (the driver benchmarks on the real chip separately)."""
import os

# Must happen before jax initializes a backend. The environment registers a
# TPU ("axon") platform via sitecustomize, so the env var alone is not enough —
# override through jax.config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
# Keep the persistent XLA compilation cache out of the shared default dir:
# entries written by axon-relay processes carry different target-machine
# feature flags and trigger AOT-loader warnings (and a SIGILL risk) when
# loaded from a plain-CPU test process.
os.environ.setdefault(
    "VSLAM_COMPCACHE_DIR",
    os.path.expanduser("~/.cache/visual_slam_tpu_xla_cputests"),
)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
