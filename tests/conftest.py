"""Test configuration: force an 8-device virtual CPU platform so data-parallel
mesh tests run without TPU hardware (SURVEY.md §4 test strategy).

The environment pins JAX_PLATFORMS=axon (the TPU tunnel); the config API
overrides it reliably before any backend initialises.
"""
import os
import resource

# XLA's CPU compile runs deep recursive passes on the calling thread; with
# the default 8 MB soft stack limit the jax-0.9 CPU backend segfaults
# compiling the shard_map PP train step late in the suite (reproducible at
# tests/test_tp_production.py::test_pp_train_step_matches_sequential, same
# compile passes standalone). Linux grows the main-thread stack on demand
# up to the CURRENT soft limit, so raising it here (before any compile)
# is effective for the whole run.
try:
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
except (ValueError, OSError):  # pragma: no cover - restricted environments
    pass

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_executables():
    """Release each module's compiled executables when it finishes.

    The jax-0.9 CPU backend accumulates per-executable state (JIT code
    mappings) across the suite's several hundred distinct compiles; left
    unbounded it segfaults inside a late native compile (reproducibly at
    test_tp_production's shard_map pipeline step, which passes standalone).
    Clearing jax's caches between modules bounds the live-executable count;
    cross-module cache reuse is near-zero anyway (each module compiles its
    own model family).
    """
    yield
    jax.clear_caches()
    if os.environ.get("VGD_TEST_DEBUG_RSS"):
        import re

        with open("/proc/self/status") as f:
            rss = re.search(r"VmRSS:\s+(\d+)", f.read()).group(1)
        with open("/proc/self/maps") as f:
            nmaps = sum(1 for _ in f)
        print(f"[conftest] rss={int(rss) // 1024}MB maps={nmaps}",
              flush=True)
