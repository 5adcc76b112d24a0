"""Fused Pallas TPU kernel for 3D LP-CV enhancement.

The XLA formulation (pipeline/segment3d._lp_cv_3d_device) materializes the
per-orientation normalized-center stack (x, y, z, 72) through HBM per chunk
(~800 MB), transposes it minor-most, and runs jnp.sort over a 72-length
minor axis padded to 128 lanes — measured 33 s for the reference's
2020x2020x170 volume, two thirds of it in the sort. This kernel fuses the
whole chain — min/max line profiles over the 72-orientation x 11-sample
stencil (neighbor.pyx:141-170 semantics), per-orientation normalized center
samples, and the exact interpolated-quartile CV combine
(hiprfish_imaging_biofilm_analysis.py:456-462) — into one VMEM-resident
program:

* the volume is processed in (x, z, y) layout so the lane dim is the large
  Y axis (2020 -> 1.4% pad) instead of Z (170 -> 51% pad);
* each grid step DMAs one (bx+P-1, bz+P-1, by+P-1) halo block into VMEM;
* the P^2 (dz, dy) minor-dim shifts are materialized ONCE as shifted
  copies, so each of the 792 stencil samples is a major-dim dynamic slice
  (free) instead of a lane rotation;
* the 25th/75th interpolated percentiles come from a Batcher odd-even
  mergesort network pruned to the four order statistics the interpolation
  reads — exact for any input, no jnp.sort, no lane-axis transpose.

Numerics match the XLA path: min/max accumulate in bf16 (selection commutes
with monotone rounding), the normalized ratio and the combine run in f32;
the only difference is f32 summation order in the orientation mean
(sequential here vs tree there), ~1e-7 relative.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.lru_cache(maxsize=None)
def _batcher_comparators(n: int):
    """Batcher odd-even mergesort comparator list (ascending) for n inputs.

    Generated for the next power of two; with +inf padding at the top,
    every comparator touching an index >= n is a no-op and is dropped.
    """
    p2 = 1
    while p2 < n:
        p2 *= 2
    comps = []
    p = 1
    while p < p2:
        k = p
        while k >= 1:
            for j in range(k % p, p2 - k, 2 * k):
                for i in range(0, k):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        a, b = i + j, i + j + k
                        if b < n:
                            comps.append((a, b))
            k //= 2
        p *= 2
    return tuple(comps)


@functools.lru_cache(maxsize=None)
def selection_network(n: int, outputs: tuple):
    """Comparators (a, b) whose removal could change the given output
    ranks — backward prune of the full Batcher network. Applying them in
    order leaves the k-th smallest at index k for every k in ``outputs``."""
    needed = set(outputs)
    kept = []
    for (a, b) in reversed(_batcher_comparators(n)):
        if a in needed or b in needed:
            kept.append((a, b))
            needed.add(a)
            needed.add(b)
    return tuple(reversed(kept))


def _quartile_ranks(t: int):
    q25, q75 = 0.25 * (t - 1), 0.75 * (t - 1)
    lo25, hi25 = int(np.floor(q25)), int(np.ceil(q25))
    lo75, hi75 = int(np.floor(q75)), int(np.ceil(q75))
    return (lo25, hi25, q25 - lo25), (lo75, hi75, q75 - lo75)


def _rup(v: int, m: int) -> int:
    return -(-v // m) * m


def _kernel(tab_ref, vol_ref, out_ref, win, copies, rnc, sem, *,
            bx, bz, by, patch, n_orient):
    """One (bx, bz, by) output block of the fused LP-CV enhancement."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    halo = patch - 1
    # DMA window sizes must be (8, 128)-aligned on the minor dims; the
    # extra rows/lanes beyond the halo are never read by the copies build.
    cp = pltpu.make_async_copy(
        vol_ref.at[pl.ds(i * bx, bx + halo),
                   pl.ds(j * bz, _rup(bz + halo, 8)),
                   pl.ds(k * by, _rup(by + halo, 128))],
        win, sem)
    cp.start()
    cp.wait()

    # All P^2 (dz, dy) minor-dim shifts once; samples then slice majors only.
    for dz in range(patch):
        for dy in range(patch):
            copies[dz * patch + dy] = win[:, dz:dz + bz, dy:dy + by]

    c = patch // 2
    center = copies[c * patch + c, c:c + bx].astype(jnp.float32)

    def orient_body(o, total):
        def sample_body(s, mm):
            vmin, vmax = mm
            dx = tab_ref[o * patch + s, 0]
            ci = tab_ref[o * patch + s, 1]
            v = copies[pl.ds(ci, 1), pl.ds(dx, bx)][0]
            return (jnp.minimum(vmin, v), jnp.maximum(vmax, v))

        vmin, vmax = jax.lax.fori_loop(
            0, patch, sample_body,
            (jnp.full((bx, bz, by), jnp.inf, jnp.bfloat16),
             jnp.full((bx, bz, by), -jnp.inf, jnp.bfloat16)))
        r = (center - vmin.astype(jnp.float32)) / jnp.maximum(
            vmax.astype(jnp.float32) - vmin.astype(jnp.float32), 1e-8)
        rnc[pl.ds(o, 1)] = r[None]
        return total + r

    total = jax.lax.fori_loop(
        0, n_orient, orient_body, jnp.zeros((bx, bz, by), jnp.float32))

    (lo25, hi25, f25), (lo75, hi75, f75) = _quartile_ranks(n_orient)
    vals = [rnc[o] for o in range(n_orient)]
    for (a, b) in selection_network(n_orient,
                                    (lo25, hi25, lo75, hi75)):
        va, vb = vals[a], vals[b]
        vals[a] = jnp.minimum(va, vb)
        vals[b] = jnp.maximum(va, vb)
    lq = vals[lo25] * (1 - f25) + vals[hi25] * f25
    uq = vals[lo75] * (1 - f75) + vals[hi75] * f75
    qcv = jnp.where(uq > 0, (uq - lq) / (uq + lq + 1e-8), 0.0)
    out_ref[:, :, :] = (total / n_orient) * (1.0 - qcv)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _enhance_xzy(vol_xzy, patch, theta_range, phi_range, blocks,
                 interpret=False):
    """Run the kernel over a padded bf16 (Xp, Zp, Yp) volume; returns the
    f32 (nx*bx, nz*bz, ny*by) enhanced volume (caller slices)."""
    from hiprfish_tpu.ops.line_profile import line_table_3d

    bx, bz, by = blocks
    halo = patch - 1
    xp, zp, yp = vol_xzy.shape
    nx = (xp - halo) // bx
    nz = (zp - halo) // bz
    ny = (yp - halo) // by
    n_orient = (theta_range - 1) * phi_range

    t3 = np.asarray(line_table_3d(patch, theta_range, phi_range))
    # (di, dj, dk) offsets in (x, y, z) -> x-offset + (dz*P + dy) copy index
    tab = np.stack([t3[:, :, 0],
                    t3[:, :, 2] * patch + t3[:, :, 1]],
                   axis=-1).reshape(-1, 2).astype(np.int32)

    kernel = functools.partial(_kernel, bx=bx, bz=bz, by=by, patch=patch,
                               n_orient=n_orient)
    return pl.pallas_call(
        kernel,
        grid=(nx, nz, ny),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((bx, bz, by), lambda i, j, k: (i, j, k)),
        out_shape=jax.ShapeDtypeStruct((nx * bx, nz * bz, ny * by),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bx + halo, _rup(bz + halo, 8),
                        _rup(by + halo, 128)), jnp.bfloat16),
            pltpu.VMEM((patch * patch, bx + halo, bz, by), jnp.bfloat16),
            pltpu.VMEM((n_orient, bx, bz, by), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(tab), vol_xzy)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def lp_cv_enhance_3d_fused(volume, patch: int = 11, theta_range: int = 9,
                           phi_range: int = 9,
                           blocks: tuple = (8, 16, 128),
                           interpret: bool = False,
                           layout: str = "xyz"):
    """Fused 3D LP-CV enhancement of an (X, Y, Z) f32 volume on TPU.

    Equivalent to pipeline/segment3d.lp_cv_enhance_3d_chunked's TPU path
    (bf16 min/max accumulation, f32 ratio/combine) with exact interpolated
    quartiles; edge padding matches np.pad(mode="edge").

    ``layout="xzy"``: the volume arrives already in the kernel's native
    (X, Z, Y) lane layout (the 3D pipeline's canonical layout) and the
    result is returned in it — the f32 minor-dim output transpose and the
    bf16 input transpose both disappear."""
    if layout == "xzy":
        x, z, y = volume.shape
    else:
        x, y, z = volume.shape
    bx, bz, by = blocks
    halo = patch - 1
    pad = halo // 2
    nx = -(-x // bx)
    nz = -(-z // bz)
    ny = -(-y // by)
    v = volume.astype(jnp.bfloat16)
    if layout != "xzy":
        v = v.transpose(0, 2, 1)                         # (X, Z, Y)
    # right-pads cover both the block grid and the (8, 128)-aligned DMA
    # window of the last block
    zr = (nz - 1) * bz + _rup(bz + halo, 8) - halo - z
    yr = (ny - 1) * by + _rup(by + halo, 128) - halo - y
    v = jnp.pad(v, ((pad, pad + nx * bx - x), (pad, pad + zr),
                    (pad, pad + yr)), mode="edge")
    out = _enhance_xzy(v, patch, theta_range, phi_range, blocks,
                       interpret)
    out = out[:x, :z, :y]
    return out if layout == "xzy" else out.transpose(0, 2, 1)
