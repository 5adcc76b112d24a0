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


# One id shared by bench.py and every CLI so they all hit the same
# persistent-cache entries. (Historical string: bench pinned it first.)
DEFAULT_AXON_SESSION = "hiprfish-bench-v1"


def pin_axon_session_inprocess() -> bool:
    """Re-pin the tunneled-TPU backend's compile-cache session id IN
    PROCESS, before first backend use.

    The deployment's boot hook (sitecustomize) registers the axon PJRT
    plugin with a fresh ``uuid4`` ``session_id`` per interpreter, and that
    id keys every persistent compile-cache entry — so two identical CLI
    runs never share a compile and every fresh process pays the full
    ~30-50 s of XLA compiles (measured round 3). Registration happens
    before any user code runs, but the CLIENT is created lazily on first
    device use: the options dict lives in the ``functools.partial`` that
    ``jax._src.xla_bridge.register_plugin`` stored, and mutating it
    before first use changes what the client (and the cache key) sees.

    Pins to ``HIPRFISH_AXON_SESSION`` (default DEFAULT_AXON_SESSION;
    ``0`` disables). Returns True when a pin was applied. No-op when the
    axon plugin isn't registered (normal CPU/TPU platforms), when the
    backend is already initialized (too late — pinning then would lie
    about the key), or when disabled.

    Caveat: the session id also keys the terminal's session lock, so
    CONCURRENT processes sharing one id share a terminal session. For a
    parallel fan-out give each process its own id (or ``0``); for the
    sequential per-stage CLI pattern (the reference's Snakemake mode,
    ecoli/Snakefile:63-114) the shared default is the right thing.
    """
    sid = os.environ.get("HIPRFISH_AXON_SESSION", DEFAULT_AXON_SESSION)
    if not sid or sid == "0":
        return False
    try:
        from jax._src import xla_bridge as xb
    except ImportError:
        return False
    reg = xb._backend_factories.get("axon")
    if reg is None:
        return False
    if getattr(xb, "_backends", None) and "axon" in xb._backends:
        import warnings

        warnings.warn(
            "hiprfish_tpu: axon backend already initialized; cannot pin "
            "the compile-cache session id in this process")
        return False
    factory = getattr(reg, "factory", reg)
    options = getattr(factory, "keywords", {}).get("options")
    if not isinstance(options, dict) or "session_id" not in options:
        return False
    options["session_id"] = sid
    return True


def maybe_register_pinned_axon_session() -> None:
    """Opt-in fix for the per-process compile-cache salt on the tunneled
    TPU platform: the boot hook registers the axon backend with a fresh
    uuid4 ``session_id`` per interpreter, which keys every persistent
    compile-cache entry — two identical runs never share an entry
    (measured), so every cold process pays the full ~30-50 s of XLA
    compiles.

    When ``HIPRFISH_AXON_MANUAL_SESSION`` is set (and the boot hook was
    skipped by clearing ``PALLAS_AXON_POOL_IPS`` in the child env — see
    bench.py's orchestrator), register the backend here with that PINNED
    session id instead, making the persistent cache hit across processes.
    No-op unless both env conditions hold."""
    sid = os.environ.get("HIPRFISH_AXON_MANUAL_SESSION")
    if not sid or os.environ.get("PALLAS_AXON_POOL_IPS"):
        return
    os.environ["AXON_POOL_SVC_OVERRIDE"] = "127.0.0.1"
    os.environ["AXON_LOOPBACK_RELAY"] = "1"
    os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
    from axon.register import register

    register(
        None,
        os.environ.get("PALLAS_AXON_TPU_GEN", "v5e") + ":1x1x1",
        so_path="/opt/axon/libaxon_pjrt.so",
        session_id=sid,
        remote_compile=os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1",
    )


def apply_platform_env() -> None:
    # Every CLI entry point routes through here. On the tunneled TPU
    # platform the session id is re-pinned in process by default
    # (pin_axon_session_inprocess) so sequential per-stage CLI processes
    # — the reference's Snakemake pattern, ecoli/Snakefile:63-114 —
    # share one persistent compile cache; HIPRFISH_AXON_SESSION=0 opts
    # out. The HIPRFISH_AXON_MANUAL_SESSION + cleared
    # PALLAS_AXON_POOL_IPS route (full re-registration) still works for
    # launchers that skip the boot hook.
    maybe_register_pinned_axon_session()
    pin_axon_session_inprocess()
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
