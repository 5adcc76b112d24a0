"""A/B the fully-static NLM kernel vs the shipped quad kernel on the real
chip: XLA+Mosaic compile wall time, pipelined runtime, and max|diff| vs the
quad kernel at 2000^2 (content: random field — NLM cost is data-independent).

Usage: python tools/exp_nlm_static.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

os.environ.setdefault("HIPRFISH_CACHE_DIR", "0")   # measure TRUE compile cost
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from hiprfish_tpu.utils.platform import apply_platform_env

apply_platform_env()

from _timing import device_time_ms  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from hiprfish_tpu.ops import nlm_pallas as npk

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2000, 2000).astype(np.float32))
    jax.block_until_ready(img)

    def build(kernel_fn, block=512):
        h, pd, pr = 0.02, 11, 3
        hh, ww = img.shape
        halo = 2 * pd + pr
        bh = bw = block
        halo_y = max(-(-halo // 4) * 4, halo)
        halo_x = -(-halo // 64) * 64
        gh, gw = pl.cdiv(hh, bh), pl.cdiv(ww, bw)
        ph, pw = gh * bh, gw * bw
        padded = jnp.pad(
            img, ((halo_y, halo_y + ph - hh), (halo_x, halo_x + pw - ww)),
            mode="reflect")
        kernel = functools.partial(
            kernel_fn, bh=bh, bw=bw, halo_y=halo_y, halo_x=halo_x, pd=pd,
            pr=pr, h2=float(h * h), unroll=1)
        call = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(gh, gw),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((bh + 2 * halo_y, bw + 2 * halo_x),
                               jnp.float32),
                    pltpu.SemaphoreType.DMA,
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((ph, pw), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        return jax.jit(lambda x: call(x)[:hh, :ww]), padded

    import functools as ft

    variants = {
        "quad": npk._nlm_kernel,
        "groups": ft.partial(npk._nlm_kernel_groups, dx_mode="fori"),
        "groups-chunk": ft.partial(npk._nlm_kernel_groups, dx_mode="chunk"),
        "groups-static": ft.partial(npk._nlm_kernel_groups,
                                    dx_mode="static"),
    }
    names = sys.argv[1:] or list(variants)
    outs = {}
    for name in names:
        kf = variants[name]
        fn, padded = build(kf)
        t0 = time.time()
        try:
            out = fn(padded)
            out.block_until_ready()
            float(out[0, 0])
        except Exception as e:  # noqa: BLE001
            print(f"{name:<8} FAILED: {repr(e)[:200]}", flush=True)
            continue
        compile_s = time.time() - t0
        ms, out = device_time_ms(fn, padded, n=8, reps=3, warmup=1)
        outs[name] = np.asarray(out)
        d = (float(np.abs(outs[name] - outs[names[0]]).max())
             if name != names[0] else 0.0)
        print(f"{name:<8} compile {compile_s:6.1f}s   run {ms:6.2f} ms"
              f"   max|d|={d:.2e}", flush=True)


if __name__ == "__main__":
    main()
