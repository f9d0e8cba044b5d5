"""Test configuration: force an 8-device virtual CPU platform so data-parallel
mesh tests run without TPU hardware (SURVEY.md §4 test strategy).

The environment pins JAX_PLATFORMS=axon (the TPU tunnel); the config API
overrides it reliably before any backend initialises.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
