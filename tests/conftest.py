"""Test harness: force CPU backend with 8 virtual devices.

Multi-device sharding (data/model mesh, ZeRO-2 partitioning, TP) is exercised
on a fake 8-device CPU mesh — this must run before anything imports jax.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
