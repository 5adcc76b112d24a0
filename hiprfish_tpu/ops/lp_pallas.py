"""Pallas TPU kernel for the fused 2D LP-CV edge enhancement.

One VMEM tile read + one write per block; the 9-orientation x 11-sample
stencil, per-profile min-max normalization, and the mean x (1 - quartile CV)
combine all run on-chip. The 9 per-orientation values are sorted with an
odd-even transposition network (exact ranks 2 and 6 are the 25th/75th
percentiles for T=9), so no general sort is needed.

Drop-in for ops/line_profile.lp_cv_enhance_2d (patch_size=11, phi_range=9).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hiprfish_tpu.ops.line_profile import line_table_2d


def _lp_kernel(img_ref, out_ref, win, sem, *, bh, bw, halo_y, halo_x,
               patch_size, phi_range):
    i = pl.program_id(0)
    j = pl.program_id(1)
    copy = pltpu.make_async_copy(
        img_ref.at[pl.ds(i * bh, bh + 2 * halo_y),
                   pl.ds(j * bw, bw + 2 * halo_x)],
        win, sem)
    copy.start()
    copy.wait()

    table = line_table_2d(patch_size, phi_range)
    pad = (patch_size - 1) // 2
    center = pad
    winv = win[:, :]

    rnc = []
    for t in range(phi_range):
        vmin = vmax = vcen = None
        for li in range(patch_size):
            di = int(table[t, li, 0]) - pad
            dj = int(table[t, li, 1]) - pad
            v = winv[halo_y + di:halo_y + di + bh,
                     halo_x + dj:halo_x + dj + bw]
            vmin = v if vmin is None else jnp.minimum(vmin, v)
            vmax = v if vmax is None else jnp.maximum(vmax, v)
            if li == center:
                vcen = v
        rnc.append((vcen - vmin) / jnp.maximum(vmax - vmin, 1e-8))

    # Odd-even transposition sort of the 9 per-orientation values.
    vals = list(rnc)
    n = len(vals)
    for rnd in range(n):
        start = rnd % 2
        for a in range(start, n - 1, 2):
            lo = jnp.minimum(vals[a], vals[a + 1])
            hi = jnp.maximum(vals[a], vals[a + 1])
            vals[a], vals[a + 1] = lo, hi
    lq = vals[(n - 1) // 4]          # rank 2 for n=9 (exact 25th pct)
    uq = vals[(3 * (n - 1)) // 4]    # rank 6 for n=9 (exact 75th pct)
    mean = sum(rnc) / n
    qcv = jnp.where(uq > 0, (uq - lq) / (uq + lq + 1e-8), 0.0)
    out_ref[:, :] = mean * (1.0 - qcv)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def lp_cv_enhance_2d_pallas(image: jax.Array, patch_size: int = 11,
                            phi_range: int = 9, block: int = 256,
                            interpret: bool = False):
    img = image.astype(jnp.float32)
    hh, ww = img.shape
    pad = (patch_size - 1) // 2
    # Tile-aligned halos (window rows mult of 8, cols mult of 128).
    halo_y = -(-pad // 4) * 4
    halo_x = 64
    bh = bw = block
    gh = pl.cdiv(hh, bh)
    gw = pl.cdiv(ww, bw)
    ph = gh * bh
    pw = gw * bw
    padded = jnp.pad(img, ((halo_y, halo_y + ph - hh),
                           (halo_x, halo_x + pw - ww)), mode="edge")

    kernel = functools.partial(_lp_kernel, bh=bh, bw=bw, halo_y=halo_y,
                               halo_x=halo_x, patch_size=patch_size,
                               phi_range=phi_range)
    out = pl.pallas_call(
        kernel,
        grid=(gh, gw),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bh + 2 * halo_y, bw + 2 * halo_x), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct((ph, pw), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(padded)
    return out[:hh, :ww]


def lp_cv_enhance_2d_auto(image, patch_size: int = 11, phi_range: int = 9):
    """Backend dispatcher: Pallas tile kernel on TPU, fused XLA elsewhere."""
    from hiprfish_tpu.ops.line_profile import lp_cv_enhance_2d

    if jax.default_backend() not in ("cpu", "gpu"):
        return lp_cv_enhance_2d_pallas(image, patch_size, phi_range)
    return lp_cv_enhance_2d(image, patch_size, phi_range)
