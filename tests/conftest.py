"""Test configuration: force CPU with 8 virtual devices for sharding tests.

The image's sitecustomize registers the remote 'axon' TPU backend and pins
``jax_platforms`` via config.update, which overrides the JAX_PLATFORMS env
var — so we must override back through jax.config before any backend use.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
