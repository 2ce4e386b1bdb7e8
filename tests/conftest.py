"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Mirrors how distributed frameworks fake multi-node in CI (SURVEY.md §4.5):
sharding/pmap paths are tested without TPU hardware. Must run before any
`import jax` anywhere in the test session.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
