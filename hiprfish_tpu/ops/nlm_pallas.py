"""Pallas TPU kernel for fast-mode non-local-means denoising.

The XLA formulation (ops/denoise.py) streams ~50 GB of HBM traffic per
2000x2000 FOV (each of 264 scan steps re-reads/re-writes full-image
temporaries). This kernel blocks the image into VMEM tiles with a
(2*patch_distance + patch_radius) halo and runs the entire offset loop
on-chip: one HBM read of the halo'd tile + one write of the result —
speed-of-light memory traffic, VPU-bound compute.

Same math as ops/denoise.denoise_nl_means (skimage fast-mode, sigma=0),
including the symmetric-offset trick: each half-window offset o contributes
both the +o term at p and the mirrored -o term (weights computed on an
extended margin so mirror weights at p+o are available in-tile).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Small static unroll factor for the dx offset loops (1 = rolled). Full
# unroll (264 bodies) compiles >20 min and a 23-body unroll spills 157 MB
# of vector registers — only small factors are viable. Env-tunable for
# experiments: HIPRFISH_NLM_UNROLL=2/4.
_DX_UNROLL = int(os.environ.get("HIPRFISH_NLM_UNROLL", "1"))


def _nlm_kernel(img_ref, out_ref, win, sem, *, bh, bw, halo_y,
                halo_x, pd, pr, h2, unroll):
    i = pl.program_id(0)
    j = pl.program_id(1)
    copy = pltpu.make_async_copy(
        img_ref.at[pl.ds(i * bh, bh + 2 * halo_y),
                   pl.ds(j * bw, bw + 2 * halo_x)],
        win, sem)
    copy.start()
    copy.wait()

    ps = 2 * pr + 1
    winv = win[:, :]
    blk = (slice(halo_y, halo_y + bh), slice(halo_x, halo_x + bw))

    def _roll(a, s, axis):
        """pltpu.roll with any-sign (possibly traced) shift."""
        n = a.shape[axis]
        if isinstance(s, int):
            s = s % n
        else:
            s = jax.lax.rem(jax.lax.rem(s, n) + n, n)
        return pltpu.roll(a, s, axis)

    # Mosaic restricts dynamic vector slices to tile-aligned starts, so the
    # per-offset shifts are expressed as dynamic rotates (pltpu.roll handles
    # traced shift amounts) followed by static slices. The halo
    # (2*patch_distance + patch_radius) absorbs all rotate wrap-around.
    # Separable patch box sum, CENTERED and CIRCULAR (wrap matches the
    # rotate semantics): box along an axis == contraction with an (n, n)
    # 0/1 circulant band, which runs on the MXU instead of the VPU's
    # roll+add tree — the ~18 full-window VPU passes per offset were the
    # largest per-offset cost (measured 2000^2: 33.6 -> 29.9 ms), and the
    # MXU sits idle in this kernel otherwise. f32 operands keep it exact
    # (bit-identical output to the roll tree on the bench fixture).
    def _band(n):
        ri = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        d = jax.lax.rem(ci - ri + n, n)
        return ((d <= pr) | (d >= n - pr)).astype(jnp.float32)

    m_sub = _band(win.shape[0])
    m_lane = _band(win.shape[1])

    def _box2_centered(e):
        t = jax.lax.dot_general(
            e, m_lane, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jax.lax.dot_general(
            m_sub, t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def per_offset(dy, dx, wdy_neg, wdy_pos, carry):
        """One (dy, dx) contribution; the dy-rolls of the window are hoisted
        into the caller's dy loop (they were recomputed for all ~2 pd+1 dx
        offsets sharing the same dy)."""
        acc, wacc = carry
        neg_roll = _roll(wdy_neg, dx, 1)      # I(p - o)
        pos_roll = _roll(wdy_pos, -dx, 1)     # I(p + o)
        e = (winv - neg_roll) ** 2
        box_c = _box2_centered(e)
        w = jnp.exp(box_c * (-1.0 / (h2 * ps * ps)))
        w_mir = _roll(_roll(w, -dy, 0), -dx, 1)
        acc = acc + w[blk] * neg_roll[blk] + w_mir[blk] * pos_roll[blk]
        wacc = wacc + w[blk] + w_mir[blk]
        return acc, wacc

    acc0 = winv[blk]
    wacc0 = jnp.ones((bh, bw), jnp.float32)

    # Loop structure: fori over both dy and dx with the window dy-rolls
    # hoisted per dy. (Static unrolls were tried and rejected: the full
    # 264-body unroll compiles for >20 min, and a 23-body dx unroll spills
    # 157 MB of vector registers past the 128 MB VMEM budget.)
    def body_row0(dx, carry):         # dy = 0 half-row: (0, dx), dx 1..pd
        return per_offset(0, dx, winv, winv, carry)

    carry = jax.lax.fori_loop(1, pd + 1, body_row0, (acc0, wacc0),
                              unroll=unroll)

    def body_dy(dy, carry):
        wdy_neg = _roll(winv, dy, 0)
        wdy_pos = _roll(winv, -dy, 0)
        carry = per_offset(dy, 0, wdy_neg, wdy_pos, carry)

        def body_dx(j, c):
            # Two independent offset chains (+dx, -dx) per iteration: the
            # per-offset dependency chain alone leaves the VPU partially
            # latency-bound, and Mosaic rejects fori_loop unroll!=1 — manual
            # pairing exposes the ILP instead (36.4 -> 33.6 ms at 2000^2,
            # bit-identical output).
            c = per_offset(dy, j, wdy_neg, wdy_pos, c)
            return per_offset(dy, -j, wdy_neg, wdy_pos, c)

        return jax.lax.fori_loop(1, pd + 1, body_dx, carry,
                                 unroll=unroll)

    acc, wacc = jax.lax.fori_loop(1, pd + 1, body_dy, carry)
    out_ref[:, :] = acc / jnp.maximum(wacc, 1e-12)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def denoise_nl_means_pallas(
    image: jax.Array,
    h: float = 0.02,
    patch_size: int = 7,
    patch_distance: int = 11,
    block: int = 512,
    interpret: bool = False,
    unroll: int | None = None,
):
    """Pallas NLM of an (H, W) image; drop-in for denoise.denoise_nl_means.

    ``interpret``: run under the Pallas interpreter (CPU CI coverage).
    ``unroll``: dx-loop unroll factor; None -> HIPRFISH_NLM_UNROLL env."""
    img = image.astype(jnp.float32)
    hh, ww = img.shape
    pd = patch_distance
    pr = patch_size // 2
    halo = 2 * pd + pr
    bh = bw = block
    # tpu.dynamic_rotate needs (8, 128)-aligned vector shapes: round halos up
    # so the VMEM window (bh + 2*halo_y, bw + 2*halo_x) is tile-aligned.
    halo_y = -(-halo // 4) * 4 if (2 * halo) % 8 else halo
    halo_y = max(halo_y, -(-halo // 4) * 4)
    halo_x = -(-halo // 64) * 64
    gh = pl.cdiv(hh, bh)
    gw = pl.cdiv(ww, bw)
    # Pad to block multiples + halo with edge values (reflect for the
    # denoising margin matters little; edge matches the XLA path's interior).
    ph = gh * bh
    pw = gw * bw
    padded = jnp.pad(
        img, ((halo_y, halo_y + ph - hh), (halo_x, halo_x + pw - ww)),
        mode="reflect")

    kernel = functools.partial(
        _nlm_kernel, bh=bh, bw=bw, halo_y=halo_y, halo_x=halo_x, pd=pd,
        pr=pr, h2=float(h * h),
        unroll=_DX_UNROLL if unroll is None else unroll)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(gh, gw),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((bh + 2 * halo_y, bw + 2 * halo_x), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((ph, pw), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(padded)
    return out[:hh, :ww]
