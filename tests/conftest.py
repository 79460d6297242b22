"""Test configuration.

Tests run JAX on CPU with 8 virtual devices so that multi-chip sharding
(`svtyper_tpu/parallel`) is exercised without TPU hardware (SURVEY.md §4.3),
and with x64 enabled so device math can be checked against the float64
oracle bit-for-bit.

Must run before `import jax` anywhere in the test process.
"""

import os
import sys

# The ambient sitecustomize (/root/.axon_site) registers the axon TPU
# backend and force-sets jax_platforms at interpreter start, so env vars
# alone can't opt out — override the config after import instead.
# SVT_HW=1 leaves the real backend alone (on-hardware tests, e.g.
# tests/test_pallas_tpu.py).
if os.environ.get("SVT_HW") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

if os.environ.get("SVT_HW") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
