"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Mirrors how distributed frameworks fake multi-node in CI (SURVEY.md §4.5):
sharding/pmap paths are tested without TPU hardware.

Note: the axon TPU plugin ignores the JAX_PLATFORMS env var, so we must use
jax.config.update before any backend initialization.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
