"""One-off: attribute the fused 2D stats stage cost on the current device.

Times label_stats / label_lookup / the Pallas kernels on RASTER-ORDERED
sequential labels (what rank_labels actually produces — band-local ids, no
window spill), to find where the isolated ~20 ms goes (round-4 7-bit push).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("HIPRFISH_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import numpy as np
from hiprfish_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import device_time_ms

from hiprfish_tpu.ops import segstats
from hiprfish_tpu.ops import segstats_pallas as sp


def t(fn, *args, reps=3):
    return device_time_ms(fn, *args, n=6, reps=reps, warmup=1)[0]


def main():
    H = W = 2000
    C = 63
    max_cells = 8192
    pre = 2 * max_cells
    rng = np.random.RandomState(0)
    lbl = np.zeros((H, W), np.int32)
    # raster-ordered ids: sort blob anchors by (row, col) before assigning
    anchors = sorted((rng.randint(20, H - 20), rng.randint(20, W - 20))
                     for _ in range(420))
    for k, (r, c) in enumerate(anchors, start=1):
        lbl[r - 7:r + 7, c - 6:c + 6] = k
    seg = jnp.asarray(lbl)
    img = jnp.asarray(rng.rand(H, W, C).astype(np.float32))
    jax.block_until_ready((seg, img))
    dev = jax.devices()[0].device_kind
    print(f"# {H}x{W}, C={C}, pre={pre}, raster-ordered ids, on {dev}")

    st = segstats.label_stats(seg, img, pre, width=256)
    print(f"# spill at w256: {bool(st.spill)}")

    for width in (256, 512):
        ms = t(jax.jit(lambda s, r, w=width: segstats.label_stats(
            s, r, pre, width=w).counts), seg, img)
        print(f"label_stats 63ch width={width:<5} {ms:7.1f} ms", flush=True)

    ms = t(jax.jit(lambda s: segstats.label_stats(
        s, None, pre, width=256).counts), seg)
    print(f"label_stats counts-only w256   {ms:7.1f} ms", flush=True)

    # Pallas kernel alone (no lax.cond fallback co-compiled)
    for width in (256, 512):
        for bpx in (8192, 16384):
            ms = t(jax.jit(lambda s, r, w=width, b=bpx: sp.stats_pallas(
                s, r, None, None, pre, w, b, 0, False, False, H, W)[0]), seg, img)
            print(f"stats_pallas w={width} band={bpx:<6} {ms:7.1f} ms",
                  flush=True)

    # XLA windowed path for comparison
    ms = t(jax.jit(lambda s, r: segstats._label_stats_windowed(
        s, r, None, None, pre, 256, 8192, 0, False).counts), seg, img)
    print(f"XLA windowed w256 band8192     {ms:7.1f} ms", flush=True)

    tbl = jnp.arange(pre, dtype=jnp.float32)
    ms = t(jax.jit(lambda s, tb: segstats.label_lookup(
        s, tb, width=256)), seg, tbl)
    print(f"label_lookup w256              {ms:7.1f} ms", flush=True)

    ms = t(jax.jit(lambda s, tb: sp.lookup_pallas(
        s, tb, 256, 8192)[0] if hasattr(sp, 'lookup_pallas') else tb), seg,
        tbl)
    print(f"lookup_pallas w256 (if any)    {ms:7.1f} ms", flush=True)

    ms = t(jax.jit(lambda r: jnp.sum(r, axis=2)), img)
    print(f"one 63ch reduce pass (1GB)     {ms:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
