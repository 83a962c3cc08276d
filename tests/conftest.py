import os

# Tests run on a virtual 8-device CPU mesh — the TPU answer to "test
# multi-node without a cluster" (SURVEY.md §4).  Must be set before jax
# initialises.
os.environ["JAX_PLATFORMS"] = "cpu"  # override the ambient axon/TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax

# The ambient axon TPU plugin force-selects itself regardless of
# JAX_PLATFORMS in the environment; the config update below is the override
# that actually sticks.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: micro-world step compiles are the dominant
# test cost on a 1-core host; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
