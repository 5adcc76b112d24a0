"""One-off #3: component probes inside the channels-last stats kernel.

Variants of _stats_kernel on the 2000^2 x 63ch shape, all with width=256,
band_px=8192, BANDS_PER_STEP=8:

  counts  — label block only: one-hot + [ones|border] dot  (floor)
  dma     — counts + image window streamed in but only trivially reduced
            (isolates the window DMA + layout cost)
  nocat   — counts + image dotted DIRECTLY against the one-hot (hi/lo in
            kernel, no feat concatenate)
  current — the shipped kernel (feat concat + hi/lo of the 65-col block)
"""

from __future__ import annotations

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import device_time_ms

from hiprfish_tpu.ops import segstats
from hiprfish_tpu.ops import segstats_pallas as sp

BANDS = 8
WIDTH = 256
BPX = 8192


def make_kernel(mode, nsteps, num_segments, n, h, w, nchan):
    def kernel(lab_ref, *rest):
        if mode == "counts":
            (out_ref, spill_ref, acc, spill) = rest
            img_ref = None
        else:
            (img_ref, out_ref, spill_ref, acc, spill) = rest
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc[:, :] = jnp.zeros_like(acc)
            spill[0] = 0

        def band_body(b, any_spill):
            lb = lab_ref[pl.ds(b, 1), :]
            pos = jnp.where(lb > 0, lb, 2**30)
            base = jnp.clip(jnp.min(pos), 0, num_segments - 1)
            loc = lb - base
            inw = (lb > 0) & (loc >= 0) & (loc < WIDTH)
            any_spill |= jnp.any((lb > 0) & ~inw).astype(jnp.int32)
            rows = jax.lax.broadcasted_iota(jnp.int32, (WIDTH, BPX), 0)
            oh = (rows == jnp.where(inw, loc, -1)).astype(jnp.bfloat16)

            band_i = i * BANDS + b
            gidx = band_i * BPX + jax.lax.broadcasted_iota(
                jnp.int32, (BPX, 1), 0)
            row = gidx // w
            col = gidx - row * w
            border = (((row == 0) | (row == h - 1) | (col == 0)
                       | (col == w - 1)) & (gidx < n)).astype(jnp.float32)
            meta = jnp.concatenate(
                [jnp.ones((BPX, 1), jnp.float32), border], axis=1)
            dn = (((1,), (0,)), ((), ()))
            part2 = jax.lax.dot_general(
                oh, meta.astype(jnp.bfloat16), dn,
                preferred_element_type=jnp.float32)        # (W, 2)

            if mode == "counts":
                acc[pl.ds(base, WIDTH), 0:2] += part2
                return any_spill

            ib = img_ref[pl.ds(b, 1)][0]                   # (BPX, C)
            if mode == "dma":
                # touch the window so the DMA can't be elided, but no dot
                acc[pl.ds(base, WIDTH), 0:2] += part2
                acc[0:1, 2:3] += jnp.sum(ib).reshape(1, 1)
                return any_spill

            if mode == "nocat":
                hi = ib.astype(jnp.bfloat16)
                lo = (ib - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                part = jax.lax.dot_general(
                    oh, hi, dn, preferred_element_type=jnp.float32)
                part += jax.lax.dot_general(
                    oh, lo, dn, preferred_element_type=jnp.float32)
                acc[pl.ds(base, WIDTH), 0:2] += part2
                acc[pl.ds(base, WIDTH), 2:] += part
                return any_spill

            # current: feat concat + hi/lo of the packed block
            feat = jnp.concatenate(
                [jnp.ones((BPX, 1), jnp.float32), border, ib], axis=1)
            hi = feat.astype(jnp.bfloat16)
            lo = (feat - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                oh, hi, dn, preferred_element_type=jnp.float32)
            part += jax.lax.dot_general(
                oh, lo, dn, preferred_element_type=jnp.float32)
            acc[pl.ds(base, WIDTH), :] += part
            return any_spill

        any_spill = jax.lax.fori_loop(0, BANDS, band_body, jnp.int32(0))

        @pl.when(any_spill > 0)
        def _():
            spill[0] = 1

        @pl.when(i == nsteps - 1)
        def _():
            out_ref[:, :] = acc[:, :]
            spill_ref[0] = spill[0]

    return kernel


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def run(labels, image, mode, num_segments, h, w):
    n = labels.size
    nb_raw = -(-n // BPX)
    nsteps = -(-nb_raw // BANDS)
    nb = nsteps * BANDS
    pad = nb * BPX - n
    lab_b = labels.reshape(-1)
    if pad:
        lab_b = jnp.pad(lab_b, (0, pad))
    lab_b = lab_b.reshape(nb, BPX)
    nchan = 0 if image is None else image.shape[-1]
    ncols = 2 + nchan if mode != "counts" else 2
    if mode == "dma":
        ncols = 2 + nchan

    inputs = [lab_b]
    in_specs = [pl.BlockSpec((BANDS, BPX), lambda i: (i, 0))]
    if image is not None:
        img_f = image.reshape(-1, nchan).astype(jnp.float32)
        if pad:
            img_f = jnp.pad(img_f, ((0, pad), (0, 0)))
        inputs.append(img_f.reshape(nb, BPX, nchan))
        in_specs.append(pl.BlockSpec((BANDS, BPX, nchan),
                                     lambda i: (i, 0, 0)))

    kernel = make_kernel(mode, nsteps, num_segments, n, h, w, nchan)
    acc, spilled = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((num_segments + WIDTH, ncols), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_segments + WIDTH, ncols), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((num_segments + WIDTH, ncols), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*inputs)
    return acc[:num_segments]


def main():
    H = W = 2000
    C = 63
    pre = 16384
    rng = np.random.RandomState(0)
    lbl = np.zeros((H, W), np.int32)
    anchors = sorted((rng.randint(20, H - 20), rng.randint(20, W - 20))
                     for _ in range(420))
    for k, (r, c) in enumerate(anchors, start=1):
        lbl[r - 7:r + 7, c - 6:c + 6] = k
    seg = jnp.asarray(lbl)
    img = jnp.asarray(rng.rand(H, W, C).astype(np.float32))
    jax.block_until_ready((seg, img))
    print(f"# probes on {jax.devices()[0].device_kind}")

    ref = np.asarray(segstats.label_stats(seg, img, pre, width=256).sums)

    def t(fn, *args):
        return device_time_ms(fn, *args, n=6, reps=3, warmup=1)[0]

    ms = t(lambda s: run(s, None, "counts", pre, H, W), seg)
    print(f"counts floor          {ms:7.1f} ms", flush=True)
    ms = t(lambda s, r: run(s, r, "dma", pre, H, W), seg, img)
    print(f"+ window DMA only     {ms:7.1f} ms", flush=True)
    out = run(seg, img, "nocat", pre, H, W)
    err = float(np.abs(np.asarray(out[:, 2:]) - ref).max())
    ms = t(lambda s, r: run(s, r, "nocat", pre, H, W), seg, img)
    print(f"+ direct dots (nocat) {ms:7.1f} ms  maxerr={err:.2e}", flush=True)
    out = run(seg, img, "current", pre, H, W)
    err = float(np.abs(np.asarray(out[:, 2:]) - ref).max())
    ms = t(lambda s, r: run(s, r, "current", pre, H, W), seg, img)
    print(f"concat+hi/lo (cur)    {ms:7.1f} ms  maxerr={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
