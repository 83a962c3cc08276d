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

# NOTE: do NOT enable the persistent compilation cache here — with worlds
# whose optional index-table fields differ in None-ness it has been observed
# to serve an executable with a mismatched buffer count ("supplied 49
# buffers but compiled program expected 51").
