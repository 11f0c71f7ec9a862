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
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           machine_cache_dir("/tmp/jax_test_cache"))
    jax.config.update("jax_compilation_cache_dir", cache)


def machine_cache_dir(prefix: str) -> str:
    """Per-machine compilation-cache path.

    A cache dir shared across machines (e.g. /tmp surviving a container
    migration) serves XLA:CPU AOT executables compiled for a DIFFERENT
    host's CPU features — observed here as cpu_aot_loader feature-mismatch
    warnings, phantom sub-millisecond timings and potential SIGILL.  Keying
    the path by a fingerprint of the host's CPU flags makes stale entries
    unreachable instead of dangerous."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    fp = hashlib.sha1(line.encode()).hexdigest()[:10]
                    break
            else:
                fp = "generic"
    except OSError:
        import platform

        fp = hashlib.sha1(platform.processor().encode()).hexdigest()[:10]
    return f"{prefix}_{fp}"
