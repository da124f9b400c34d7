"""Test harness config: force an 8-virtual-device CPU JAX platform.

Tests never touch real TPU hardware: sharding tests run on the virtual CPU
mesh (SURVEY.md §4), Pallas kernels run in interpreter mode.  The axon TPU
plugin (if present) force-selects itself via ``jax.config``; we override it
back to CPU *after* importing jax, which is the supported escape hatch.
"""
import os

# Must be set before the XLA CPU client is created.
_flag = "--xla_force_host_platform_device_count=8"
if _flag not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + _flag).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
