"""Test configuration: force JAX onto CPU with 8 virtual devices so the
multi-chip sharding paths can be exercised without TPU hardware
(SURVEY.md §4 "multi-node without a cluster").

NOTE: this environment's sitecustomize registers the axon TPU plugin for
every Python process and overrides the JAX_PLATFORMS env var, so the only
reliable way to force CPU is jax.config.update after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache (round-3 verdict weak item 8): the slow tier
# is dominated by CPU-JAX compiles of reference-scale executables; caching
# them makes re-runs minutes instead of ~37 min. The 1 s min-compile-time
# floor (utils/compcache.py) keeps the thousands of small test executables
# out of the cache.
from abc_tpu.utils.compcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
