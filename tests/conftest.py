"""Test configuration: run everything on a virtual 8-device CPU mesh so
distributed code paths are exercised without TPU pod hardware (per SURVEY §4:
``xla_force_host_platform_device_count``).

Note: the axon sitecustomize force-registers the TPU backend before conftest
runs, so ``JAX_PLATFORMS`` env mutation is too late — we must go through
``jax.config.update``.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
