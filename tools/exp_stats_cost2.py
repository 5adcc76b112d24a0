"""One-off #2: free-knob A/B for the fused 2D stats stage (round-4 push).

Raster-ordered ids (no spill). Tests width/band_px knobs on the existing
channels-last kernel, and the channels-major kernel fed by an upfront
transpose — all on the 2000^2 x 63ch fused-path shape.
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
    anchors = sorted((rng.randint(20, H - 20), rng.randint(20, W - 20))
                     for _ in range(420))
    for k, (r, c) in enumerate(anchors, start=1):
        lbl[r - 7:r + 7, c - 6:c + 6] = k
    seg = jnp.asarray(lbl)
    img = jnp.asarray(rng.rand(H, W, C).astype(np.float32))
    jax.block_until_ready((seg, img))
    print(f"# {H}x{W} C={C} pre={pre} on {jax.devices()[0].device_kind}")

    ref = np.asarray(segstats.label_stats(seg, img, pre, width=256).sums)

    for width in (128, 256):
        for bpx in (8192,):
            out = sp.stats_pallas(seg, img, None, None, pre, width, bpx, 0,
                                  False, False, H, W)
            err = float(np.abs(np.asarray(out[0][:, 2:]) - ref).max())
            ms = t(jax.jit(lambda s, r, w=width, b=bpx: sp.stats_pallas(
                s, r, None, None, pre, w, b, 0, False, False, H, W)[0]), seg, img)
            print(f"stats_pallas(cl) w={width:<4} band={bpx:<6} {ms:7.1f} ms"
                  f"  maxerr={err:.2e}", flush=True)

    # channels-major route: transpose + cm kernel (counts+sums, no border)
    for width in (128, 256):
        @jax.jit
        def cm_route(s, r, w=width):
            rcm = jnp.transpose(r, (2, 0, 1))
            acc, spill = sp.stats_cm_pallas(s, rcm, pre, w, 8000, 1)
            return acc

        out = cm_route(seg, img)
        err = float(np.abs(np.asarray(out[:, 1:]) - ref).max())
        ms = t(cm_route, seg, img)
        print(f"transpose+cm w={width:<4}          {ms:7.1f} ms"
              f"  maxerr={err:.2e}", flush=True)

    # the transpose alone
    ms = t(jax.jit(lambda r: jnp.transpose(r, (2, 0, 1)) * 1.0), img)
    print(f"transpose (2,0,1) alone        {ms:7.1f} ms", flush=True)

    # cm kernel alone on a channels-major-resident image
    img_cm = jnp.transpose(img, (2, 0, 1)).copy()
    jax.block_until_ready(img_cm)
    for width in (128, 256):
        ms = t(jax.jit(lambda s, r, w=width: sp.stats_cm_pallas(
            s, r, pre, w, 8000, 1)[0]), seg, img_cm)
        print(f"cm-resident  w={width:<4}          {ms:7.1f} ms", flush=True)

    # counts-only floor at both widths
    for width in (128, 256):
        ms = t(jax.jit(lambda s, w=width: sp.stats_pallas(
            s, None, None, None, pre, w, 8192, 0, False, False, H, W)[0]), seg)
        print(f"counts-only  w={width:<4}          {ms:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
