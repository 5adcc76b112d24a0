"""Platform selection helper.

Some deployments pin a TPU plugin via sitecustomize, which overrides
JAX_PLATFORMS. HIPRFISH_PLATFORM=cpu[:N] (e.g. 'cpu:8' for 8 virtual
devices) forces the platform through the config API, which wins if applied
before first device use. CLI entry points call apply_platform_env() first.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
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
