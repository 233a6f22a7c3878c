"""Test configuration: force an 8-device virtual CPU platform.

The container's sitecustomize registers the axon TPU PJRT plugin (and imports
jax) at interpreter startup, so env vars alone are read too early to change --
but backend *initialization* is lazy, so overriding jax_platforms via
jax.config before the first computation reliably selects CPU, and XLA_FLAGS is
also only read at backend init.

Multi-host / multi-chip logic is tested on this virtual 8-device mesh (the
JAX-native analog of a fake backend); real-TPU paths are exercised by
bench.py / __graft_entry__.py which keep the axon TPU platform.
"""

import os

import jax

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

jax.config.update("jax_platforms", "cpu")
