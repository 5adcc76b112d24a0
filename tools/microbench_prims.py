"""Micro-benchmarks of the primitive formulations competing for the hot
pipeline stages (VERDICT item 5): scatter-add vs gather vs cumsum vs
windowed-matmul segment reduction, plus scan-round costs, on the current
device. Informs which reformulation of filter_and_relabel / measure /
fill_holes is worth building."""

from __future__ import annotations

import os
import sys
import time

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


def timeit(fn, *args, reps=5, warmup=1):
    return device_time_ms(fn, *args, n=6, reps=reps, warmup=warmup)[0]


def main():
    H = W = 2000
    N = H * W
    C = 67
    MAXC = 8192
    rng = np.random.RandomState(0)
    # Realistic-ish labels: ~400 blobs, 85% background.
    lbl_np = np.zeros((H, W), np.int32)
    for i in range(400):
        r, c = rng.randint(20, H - 20), rng.randint(20, W - 20)
        lbl_np[r - 6:r + 6, c - 6:c + 6] = r * W + c + 1  # linear-index ids
    labels_lin = jnp.asarray(lbl_np)                       # watershed-style ids
    # sequential ids 1..n
    u = np.unique(lbl_np)
    remap = np.zeros(u.max() + 1, np.int32)
    remap[u] = np.arange(len(u))
    labels_seq = jnp.asarray(remap[lbl_np])
    img = jnp.asarray(rng.rand(H, W, C).astype(np.float32))
    mask = jnp.asarray(lbl_np == 0)

    out = {}

    flat_lin = labels_lin.reshape(-1)
    flat_seq = labels_seq.reshape(-1)

    f = jax.jit(lambda fl: jnp.zeros((N + 1,), jnp.int32).at[
        jnp.clip(fl, 0, N)].add(1))
    out["scatter_add counts -> 4M table"] = timeit(f, flat_lin)

    f = jax.jit(lambda fl: jnp.zeros((MAXC,), jnp.int32).at[
        jnp.clip(fl, 0, MAXC - 1)].add(1))
    out["scatter_add counts -> 8k table"] = timeit(f, flat_seq)

    tbl_big = jnp.arange(N + 1, dtype=jnp.int32)
    f = jax.jit(lambda t, fl: t[jnp.clip(fl, 0, N)])
    out["gather 4M from 4M table"] = timeit(f, tbl_big, flat_lin)

    tbl_small = jnp.arange(MAXC, dtype=jnp.int32)
    f = jax.jit(lambda t, fl: t[jnp.clip(fl, 0, MAXC - 1)])
    out["gather 4M from 8k table"] = timeit(f, tbl_small, flat_seq)

    f = jax.jit(lambda fl: jnp.cumsum(
        (fl == jnp.arange(1, N + 1, dtype=jnp.int32)).astype(jnp.int32)))
    out["presence+cumsum 4M"] = timeit(f, flat_lin)

    f = jax.jit(lambda s, fl: jax.ops.segment_sum(
        s.reshape(-1, C), fl, num_segments=MAXC))
    out["segment_sum 4Mx67 -> 8k"] = timeit(f, img, flat_seq)

    # Windowed one-hot matmul segment-sum: scan over row bands.
    def windowed(img, labels, width, band_px):
        nb = N // band_px
        lab_b = labels.reshape(nb, band_px)
        img_b = img.reshape(nb, band_px, C)

        def body(acc, xs):
            lb, ib = xs
            pos = jnp.where(lb > 0, lb, jnp.int32(2**30))
            base = jnp.minimum(jnp.min(pos), MAXC - 1)
            loc = lb - base
            inw = (lb > 0) & (loc >= 0) & (loc < width)
            loc = jnp.where(inw, loc, 0)
            oh = (loc[:, None] == jnp.arange(width, dtype=jnp.int32)[None, :])
            oh = (oh & inw[:, None]).astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                oh, ib.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # (width, C)
            cur = jax.lax.dynamic_slice(acc, (base, 0), (width, C))
            acc = jax.lax.dynamic_update_slice(acc, cur + part, (base, 0))
            spill = jnp.any((lb > 0) & ~inw)
            return acc, spill

        acc0 = jnp.zeros((MAXC + width, C), jnp.float32)
        acc, spills = jax.lax.scan(body, acc0, (lab_b, img_b))
        return acc[:MAXC], jnp.any(spills)

    for width, band_px in [(512, 16000), (1024, 16000), (512, 50000),
                           (1024, 50000)]:
        f = jax.jit(lambda i, l, w=width, b=band_px: windowed(
            i, l, w, b))
        out[f"windowed matmul segsum w={width} band={band_px}"] = timeit(
            f, img, flat_seq)

    # Scan-round costs (the flood/label building blocks).
    from hiprfish_tpu.ops.labeling import _run_or_scan, _run_min_scan

    f = jax.jit(lambda m: _run_or_scan(m, m, 0, False))
    out["or-scan 1 axis (bool 2000^2)"] = timeit(f, mask)

    vals = jnp.where(mask, jnp.arange(N, dtype=jnp.int32).reshape(H, W),
                     jnp.int32(2**30))
    f = jax.jit(lambda v, m: _run_min_scan(v, m, 0, False))
    out["min-scan 1 axis (i32 2000^2)"] = timeit(f, vals, mask)

    # bandwidth yardstick
    big = jnp.zeros((4096, 4096), jnp.float32)
    f = jax.jit(lambda x: x + 1.0)
    ms = timeit(f, big)
    out[f"elementwise 64MB r+w ({2*big.nbytes/1e9:.2f} GB)"] = ms

    width = max(len(k) for k in out)
    for k, v in out.items():
        print(f"{k:<{width}}  {v:8.2f} ms")


if __name__ == "__main__":
    main()
