"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Mirrors the reference's `fast` CPU tier (reference: README.md:48-55,
tests/test_npe_pfn.py:20-22) and additionally exercises multi-device sharding
without TPU hardware via XLA's host-platform device count.

Note: this environment ships a sitecustomize hook that force-selects the
remote `axon` TPU backend for every Python process (each claim costs ~4 min
of wall clock). Tests must run on local CPU, so we override the platform
config *after* import — the env var alone is ignored because the hook sets
the jax config directly.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
