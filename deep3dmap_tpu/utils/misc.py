"""Misc utilities."""
from __future__ import annotations

import os


def maybe_force_platform():
    """Honor D3M_PLATFORM / D3M_NUM_DEVICES env vars before jax backends
    initialize.  Needed because the axon TPU plugin force-sets jax_platforms
    via jax.config at interpreter start, making JAX_PLATFORMS ineffective
    (see tests/conftest.py)."""
    plat = os.environ.get("D3M_PLATFORM")
    if not plat:
        return
    import jax

    jax.config.update("jax_platforms", plat)
    n = os.environ.get("D3M_NUM_DEVICES")
    if n and plat == "cpu":
        jax.config.update("jax_num_cpu_devices", int(n))
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
