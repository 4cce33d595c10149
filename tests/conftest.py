"""Test configuration: force the JAX CPU backend with 8 virtual devices.

The reference renderer has no tests (SURVEY.md §4); we add a full suite.  Everything
must run without a TPU: BASELINE.json config 1 explicitly targets the JAX CPU
backend, and multi-chip sharding is validated on a virtual 8-device CPU mesh.

Note: this environment's sitecustomize registers an 'axon' TPU platform and calls
jax.config.update("jax_platforms", ...) at interpreter start, which overrides the
JAX_PLATFORMS env var — so we must re-update the config here, before any test
touches a device.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
