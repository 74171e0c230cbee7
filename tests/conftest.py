"""Test config: force an 8-device virtual CPU mesh so sharding paths are
exercised without TPU hardware (bench.py runs on the real chip separately).

NB: the axon TPU plugin programmatically sets jax_platforms='axon,cpu' at
import, which SILENTLY overrides the JAX_PLATFORMS env var — so the env
var alone is not enough; we must also call jax.config.update after import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

try:
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu", jax.devices()
except ImportError:
    pass
