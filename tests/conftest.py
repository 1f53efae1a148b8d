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
# persistent compile cache: XLA CPU compiles of the full model are the
# dominant test cost on a 1-core host; cache across runs
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.abspath(_cache_dir))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# The axon TPU plugin (sitecustomize) force-sets jax_platforms='axon,cpu',
# overriding the env var; pin the config back to CPU before any backend
# initializes so tests really run on the virtual 8-device CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# ---------------------------------------------------------------------- #
# two test tiers: the default tier must stay green in <10 min on a 1-core
# host from a warm compile cache; tests that compile full training graphs
# or spawn multi-process meshes are marked `heavy` and skipped by default.
# Run them with RUN_HEAVY=1 (or select explicitly via `-m heavy`).
# ---------------------------------------------------------------------- #


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "heavy: compile-heavy tier (training-graph compiles, multiprocess "
        "meshes); skipped by default — run with RUN_HEAVY=1 or -m heavy",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RUN_HEAVY") == "1":
        return
    if config.getoption("-m"):
        return  # an explicit -m expression takes over selection
    skip = pytest.mark.skip(
        reason="heavy tier (set RUN_HEAVY=1 or use -m heavy)"
    )
    for item in items:
        if "heavy" in item.keywords:
            item.add_marker(skip)
