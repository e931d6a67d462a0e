"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-world equivalent of "test multi-node without a cluster"
(SURVEY.md §4): XLA_FLAGS forces 8 host devices so sharding/pjit logic is
exercised without TPU hardware. Must run before jax is imported anywhere.
"""

import os

# Force the CPU backend for tests unless explicitly opted out (the 8-device
# mesh below only exists on CPU; set VIDU4D_TEST_TPU=1 to exercise real TPU
# lowering instead).
if not os.environ.get("VIDU4D_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin overrides the JAX_PLATFORMS env var during
# registration; forcing the config after import reliably selects CPU.
if not os.environ.get("VIDU4D_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")

# persistent compilation cache: repeated test runs skip recompiles
jax.config.update("jax_compilation_cache_dir", "/tmp/vidu4d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
