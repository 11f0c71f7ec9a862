"""Test environment: run everything on a virtual 8-device CPU mesh.

This is the MultiProcessTestCase analogue from the reference's test strategy
(SURVEY.md §4): multi-chip sharding semantics are validated on one host by
exposing 8 virtual CPU devices.  The axon TPU plugin (if present) forces
``jax_platforms='axon,cpu'`` via jax.config at interpreter start, so env vars
are not enough — we override the config before any backend initializes.
"""
import os

os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
from deep3dmap_tpu.utils.misc import machine_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  machine_cache_dir("/tmp/jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
