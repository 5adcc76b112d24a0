"""Reliable device timing under the axon remote-TPU tunnel.

`jax.block_until_ready` does not actually wait on this platform (dispatch is
fully async through the tunnel), so per-call wall timing reads ~0. The robust
method: enqueue N identical executions (the device runs them serially), then
force completion with a tiny scalar device_get that depends on the last
output; subtract the measured round-trip constant and divide by N.
"""

from __future__ import annotations

import time

import numpy as np


def _tiny_sync(out):
    """Force completion of `out`'s computation with a minimal transfer."""
    import jax
    import jax.numpy as jnp

    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype")]
    acc = jnp.float32(0)
    for x in leaves:
        acc = acc + jnp.sum(x.ravel()[:1]).astype(jnp.float32)
    return float(acc)  # device_get of one scalar


def roundtrip_ms(reps: int = 5) -> float:
    import jax.numpy as jnp

    x = jnp.zeros(())
    _ = float(x)
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        _ = float(x + 1.0)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1000


_RT = None


def device_time_ms(fn, *args, n: int = 8, reps: int = 3,
                   warmup: int = 1):
    """Median per-execution device time of fn(*args), in ms.

    Returns (ms, last_output). Queues `n` executions per reading and syncs
    once, so the tunnel round-trip amortizes; the round-trip constant is
    measured once and subtracted.
    """
    global _RT
    if _RT is None:
        _RT = roundtrip_ms()
    out = None
    for _ in range(warmup):
        out = fn(*args)
        _tiny_sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _i in range(n):
            out = fn(*args)
        _tiny_sync(out)
        ts.append(time.perf_counter() - t0)
    ms = (float(np.median(ts)) * 1000 - _RT) / n
    return max(ms, 0.0), out
