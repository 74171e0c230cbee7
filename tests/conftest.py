"""Test config: force an 8-device virtual CPU mesh so sharding paths are
exercised without TPU hardware (bench.py runs on the real chip separately)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env may pre-set a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
