"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

This is the TPU-native analogue of "multi-node testing without a cluster"
(the reference has none, SURVEY.md §4): all sharding/collective paths are
exercised on 8 virtual CPU devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("JAX_ENABLE_X64", "0")
