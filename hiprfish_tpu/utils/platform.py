"""Platform selection + persistent-compile-cache helper.

Some deployments pin a TPU plugin via sitecustomize, which overrides
JAX_PLATFORMS. HIPRFISH_PLATFORM=cpu[:N] (e.g. 'cpu:8' for 8 virtual
devices) forces the platform through the config API, which wins if applied
before first device use. CLI entry points call apply_platform_env() first.

The 3D programs cold-compile in minutes; every CLI therefore enables JAX's
persistent compilation cache (HIPRFISH_CACHE_DIR overrides the location,
HIPRFISH_CACHE_DIR=0 disables; an explicit JAX_COMPILATION_CACHE_DIR always
wins) so a pipeline binary pays each compile once per machine.
"""

from __future__ import annotations

import os


def apply_compile_cache_env() -> None:
    """Enable the persistent compile cache via the jax.config API — env vars
    are read at jax import time, which a sitecustomize-registered plugin has
    already triggered before any user code runs, so JAX_COMPILATION_CACHE_DIR
    set from Python would be silently ignored."""
    spec = os.environ.get("HIPRFISH_CACHE_DIR")
    if spec == "0":
        return
    cache = (os.environ.get("JAX_COMPILATION_CACHE_DIR") or spec
             or os.path.join(os.path.expanduser("~"), ".cache",
                             "hiprfish_tpu", "jax_cache"))
    os.makedirs(cache, exist_ok=True)
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def apply_platform_env() -> None:
    apply_compile_cache_env()
    spec = os.environ.get("HIPRFISH_PLATFORM")
    if not spec:
        return
    import jax

    parts = spec.split(":")
    try:
        jax.config.update("jax_platforms", parts[0])
        if len(parts) > 1 and parts[0] == "cpu":
            jax.config.update("jax_num_cpu_devices", int(parts[1]))
    except RuntimeError:
        # Backends already initialized — leave the platform as-is.
        pass
