"""Test configuration: run on a virtual 8-device CPU mesh with x64 available.

Sharding tests need multiple devices without TPU hardware; parity tests vs
the float64 NumPy oracle need x64. The axon site package force-sets
JAX_PLATFORMS=axon, so the platform must be overridden through jax.config
(env vars alone are ignored) before the backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, jax.devices()


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (long OSSE/realcase integration runs)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long integration test, skipped unless --runslow or RUN_SLOW=1")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow (use --runslow or RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
