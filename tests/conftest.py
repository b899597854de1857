"""Test harness config: run JAX on CPU with 8 virtual devices so all
sharding/multi-chip logic is exercised without TPU hardware (SURVEY.md §4).

This environment pre-imports jax (sitecustomize) with JAX_PLATFORMS baked,
so plain env-var overrides are too late — the platform must be forced via
jax.config, and XLA_FLAGS set before the first backend initialization.
"""

import os
import sys
from pathlib import Path

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def pytest_report_header(config):
    return f"jax backend: {jax.default_backend()}, devices: {jax.device_count()}"
