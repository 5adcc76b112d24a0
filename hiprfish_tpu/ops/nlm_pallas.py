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

Kernel shape (round-5 rework): dy rows ride in Python-unrolled STATIC
groups of up to 4 (_nlm_kernel_groups; HIPRFISH_NLM_KERNEL selects) —
each group's e-planes share one concatenated lane-dim box matmul, one
sublane roll-tree and one exp per +-dx side (the r04 quad batching), and
because the dy offsets are compile-time constants every sublane roll is
a single-pass static shift instead of a multi-pass dynamic rotate, and
the leftover dy rows (pd % 4) are batched too. Measured at 2000^2
(tools/exp_nlm_static.py): r03 kernel 35.2 ms -> r04 quads 26.7 -> r05
groups 17.3 ms pipelined, bit-identical output, 4x faster Mosaic compile
(232 s -> 57 s cache-cold). Rejected along the way: incremental static
rolls via loop carries (carry copies), dx shifts on the sublane axis
(dynamic sublane rotates are slower), batching input rolls through
concatenated planes (adds concats), 8-plane groups (saturated at 4), and
the r04-era full per-offset static unroll of the OLD kernel (Mosaic
compile exceeded 19 min; the group kernel's 'groups-static' mode is the
tractable version of that idea, pending an uncontended measurement).
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
    S = win.shape[0]
    winv = win[:, :]
    blk = (slice(halo_y, halo_y + bh), slice(halo_x, halo_x + bw))

    def _roll(a, s, axis):
        """pltpu.roll with any-sign (possibly traced) shift."""
        n = a.shape[axis]
        if isinstance(s, int):
            if s % n == 0:
                return a
            s = s % n
        else:
            s = jax.lax.rem(jax.lax.rem(s, n) + n, n)
        return pltpu.roll(a, s, axis)

    # Mosaic restricts dynamic vector slices to tile-aligned starts, so the
    # per-offset shifts are expressed as dynamic rotates (pltpu.roll handles
    # traced shift amounts) followed by static slices. The halo
    # (2*patch_distance + patch_radius) absorbs all rotate wrap-around.
    # Lane-dim patch box sum, CENTERED and CIRCULAR (wrap matches the
    # rotate semantics): contraction with an (n, n) 0/1 circulant band,
    # which runs on the MXU instead of the VPU's roll+add tree. f32
    # operands keep it exact (bit-identical output to the roll tree on
    # the bench fixture).
    def _band(n):
        ri = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        d = jax.lax.rem(ci - ri + n, n)
        return ((d <= pr) | (d >= n - pr)).astype(jnp.float32)

    m_lane = _band(win.shape[1])

    # Sublane-dim box as a STATIC roll tree (cheap single-pass shifts; the
    # (S, S) sublane-contracting matmul measured ~2x the lane dot because
    # the lhs-lane contraction forces an operand transpose). Greedy binary
    # cover of the ps-tap window, then a centering roll: for ps = 7,
    # R = P4 + roll(P2, -4) + roll(P1, -6), centered by +pr.
    def _tree_sub(t):
        pows = [t]                       # pows[i] sums 2^i consecutive rows
        width = 1
        while width * 2 <= ps:
            pows.append(pows[-1] + _roll(pows[-1], -width, 0))
            width *= 2
        r = None
        off = 0
        for i_bit in range(len(pows) - 1, -1, -1):
            w_bit = 1 << i_bit
            if ps & w_bit:
                part = _roll(pows[i_bit], -off, 0) if off else pows[i_bit]
                r = part if r is None else r + part
                off += w_bit
        return _roll(r, pr, 0)

    def _box2(e):
        t = jax.lax.dot_general(
            e, m_lane, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return _tree_sub(t)

    inv = -1.0 / (h2 * ps * ps)

    def per_offset(dy, dx, neg_roll, pos_roll, carry):
        """One (dy, dx) contribution from pre-rolled input planes."""
        acc, wacc = carry
        e = (winv - neg_roll) ** 2
        w = jnp.exp(_box2(e) * inv)
        w_mir = _roll(_roll(w, -dy, 0), -dx, 1)
        acc = acc + w[blk] * neg_roll[blk] + w_mir[blk] * pos_roll[blk]
        wacc = wacc + w[blk] + w_mir[blk]
        return acc, wacc

    acc0 = winv[blk]
    wacc0 = jnp.ones((bh, bw), jnp.float32)

    # dy = 0 half-row: (0, dx) for dx 1..pd (single-plane passes).
    def body_row0(dx, carry):
        return per_offset(0, dx, _roll(winv, dx, 1), _roll(winv, -dx, 1),
                          carry)

    carry = jax.lax.fori_loop(1, pd + 1, body_row0, (acc0, wacc0),
                              unroll=unroll)

    # dy rows in quads: the four (winv - neg_roll)^2 planes of one +-dx
    # side concatenate along sublanes through ONE lane-dim box dot, one
    # sublane tree, and one exp. Tree/lane-band wrap-around at the concat
    # seams stays outside each segment's blk +- pd rows (halo_y >= pd +
    # tree reach). W4 is hoisted so the e-planes need no per-side concat
    # of winv itself.
    n_quads = pd // 4
    if n_quads:
        W4 = jnp.concatenate([winv] * 4, axis=0)

        def body_dyquad(k, carry):
            dys = [4 * k + 1, 4 * k + 2, 4 * k + 3, 4 * k + 4]
            N = jnp.concatenate([_roll(winv, d, 0) for d in dys], axis=0)
            P = jnp.concatenate([_roll(winv, -d, 0) for d in dys], axis=0)

            def quad_side(jj, carry):
                """The four (dy_i, jj) offsets in one batched pass."""
                acc, wacc = carry
                Nr = _roll(N, jj, 1)
                Pr = _roll(P, -jj, 1)
                e_all = (W4 - Nr) ** 2
                w_all = jnp.exp(_box2(e_all) * inv)
                wl = _roll(w_all, -jj, 1)     # lane part of the mirrors
                for i_s, d in enumerate(dys):
                    sl = slice(i_s * S, (i_s + 1) * S)
                    w = w_all[sl]
                    w_mir = _roll(wl[sl], -d, 0)
                    acc = (acc + w[blk] * Nr[sl][blk]
                           + w_mir[blk] * Pr[sl][blk])
                    wacc = wacc + w[blk] + w_mir[blk]
                return acc, wacc

            carry = quad_side(0, carry)

            def body_dx(jj, c):
                return quad_side(-jj, quad_side(jj, c))

            return jax.lax.fori_loop(1, pd + 1, body_dx, carry,
                                     unroll=unroll)

        carry = jax.lax.fori_loop(0, n_quads, body_dyquad, carry)

    # Leftover dy rows (pd % 4 of them): single-plane passes with the
    # +-dx pairing for ILP.
    if 4 * n_quads < pd:

        def body_dy(dy, carry):
            wdy_neg = _roll(winv, dy, 0)
            wdy_pos = _roll(winv, -dy, 0)
            carry = per_offset(dy, 0, wdy_neg, wdy_pos, carry)

            def body_dx(jj, c):
                c = per_offset(dy, jj, _roll(wdy_neg, jj, 1),
                               _roll(wdy_pos, -jj, 1), c)
                return per_offset(dy, -jj, _roll(wdy_neg, -jj, 1),
                                  _roll(wdy_pos, jj, 1), c)

            return jax.lax.fori_loop(1, pd + 1, body_dx, carry,
                                     unroll=unroll)

        carry = jax.lax.fori_loop(4 * n_quads + 1, pd + 1, body_dy, carry)

    acc, wacc = carry
    out_ref[:, :] = acc / jnp.maximum(wacc, 1e-12)


def _nlm_kernel_groups(img_ref, out_ref, win, sem, *, bh, bw, halo_y,
                       halo_x, pd, pr, h2, dx_mode, unroll):
    """Group-batched variant of _nlm_kernel with STATIC dy offsets: the dy
    groups ([4, 4, pd%4]) are Python-unrolled, so the sublane rolls that
    build each group's N/P stacks and every per-plane mirror roll are
    compile-time shifts (single-pass) instead of dynamic rotates
    (multi-pass lane permutes — the dominant kernel cost, PROFILE_r04).
    The leftover dy rows ride the same batched box-dot/exp as the quads
    (they were single-plane passes before).

    ``dx_mode`` picks how lane (dx) offsets are generated:
      * 'fori':   rolled loop, dynamic lane rotates per offset (safe
                  compile, the r04 behavior).
      * 'chunk':  fori over chunks of 4 with a dynamic base rotate per
                  side, + static sub-rolls: roll(roll(x, m), t) ==
                  roll(x, m+t) exactly (rolls are permutations), so only
                  the per-offset mirror-weight rotate stays dynamic.
      * 'static': every dx is Python-unrolled — zero dynamic rotates, but
                  ~(2 pd + 1) materialized bodies per group; Mosaic
                  compile cost must be measured before shipping.
    Accumulation order matches _nlm_kernel's quad path for the first
    pd//4 * 4 dy rows and batches the leftover rows group-major; the
    XLA-path contract is atol 1e-6 (the XLA scan's own order differs from
    both kernels), covered by tests/test_nlm_pallas_interpret.py."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    copy = pltpu.make_async_copy(
        img_ref.at[pl.ds(i * bh, bh + 2 * halo_y),
                   pl.ds(j * bw, bw + 2 * halo_x)],
        win, sem)
    copy.start()
    copy.wait()

    ps = 2 * pr + 1
    S = win.shape[0]
    winv = win[:, :]
    blk = (slice(halo_y, halo_y + bh), slice(halo_x, halo_x + bw))

    def _roll(a, s, axis):
        n = a.shape[axis]
        if isinstance(s, int):
            s = s % n
            if s == 0:
                return a
        else:
            s = jax.lax.rem(jax.lax.rem(s, n) + n, n)
        return pltpu.roll(a, s, axis)

    def _band(n):
        ri = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        d = jax.lax.rem(ci - ri + n, n)
        return ((d <= pr) | (d >= n - pr)).astype(jnp.float32)

    m_lane = _band(win.shape[1])

    def _tree_sub(t):
        pows = [t]
        width = 1
        while width * 2 <= ps:
            pows.append(pows[-1] + _roll(pows[-1], -width, 0))
            width *= 2
        r = None
        off = 0
        for i_bit in range(len(pows) - 1, -1, -1):
            w_bit = 1 << i_bit
            if ps & w_bit:
                part = _roll(pows[i_bit], -off, 0) if off else pows[i_bit]
                r = part if r is None else r + part
                off += w_bit
        return _roll(r, pr, 0)

    def _box2(e):
        t = jax.lax.dot_general(
            e, m_lane, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return _tree_sub(t)

    inv = -1.0 / (h2 * ps * ps)
    acc0 = winv[blk]
    wacc0 = jnp.ones((bh, bw), jnp.float32)

    # dy = 0 half-row: single-plane passes (same as _nlm_kernel).
    def per_offset0(dx, neg, pos, carry):
        acc, wacc = carry
        e = (winv - neg) ** 2
        w = jnp.exp(_box2(e) * inv)
        w_mir = _roll(w, -dx, 1)
        acc = acc + w[blk] * neg[blk] + w_mir[blk] * pos[blk]
        wacc = wacc + w[blk] + w_mir[blk]
        return acc, wacc

    if dx_mode == "static":
        carry = (acc0, wacc0)
        for dx in range(1, pd + 1):
            carry = per_offset0(dx, _roll(winv, dx, 1), _roll(winv, -dx, 1),
                                carry)
    else:
        carry = jax.lax.fori_loop(
            1, pd + 1,
            lambda dx, c: per_offset0(dx, _roll(winv, dx, 1),
                                      _roll(winv, -dx, 1), c),
            (acc0, wacc0), unroll=unroll)

    start = 1
    groups = [4] * (pd // 4) + ([pd % 4] if pd % 4 else [])
    T = 4  # chunk width for dx_mode == 'chunk'
    for G in groups:
        dys = list(range(start, start + G))
        start += G
        WG = jnp.concatenate([winv] * G, axis=0) if G > 1 else winv

        def _stack(sign):
            planes = [_roll(winv, sign * d, 0) for d in dys]
            return jnp.concatenate(planes, axis=0) if G > 1 else planes[0]

        N = _stack(1)
        P = _stack(-1)

        def group_side(jj, Nr, Pr, carry):
            """One dx side from pre-rolled stacks; dys/G are static."""
            acc, wacc = carry
            e_all = (WG - Nr) ** 2
            w_all = jnp.exp(_box2(e_all) * inv)
            wl = _roll(w_all, -jj, 1)
            for i_s, d in enumerate(dys):
                sl = slice(i_s * S, (i_s + 1) * S)
                w = w_all[sl]
                w_mir = _roll(wl[sl], -d, 0)
                acc = (acc + w[blk] * Nr[sl][blk]
                       + w_mir[blk] * Pr[sl][blk])
                wacc = wacc + w[blk] + w_mir[blk]
            return acc, wacc

        carry = group_side(0, N, P, carry)
        if dx_mode == "static":
            for t in range(1, pd + 1):
                carry = group_side(t, _roll(N, t, 1), _roll(P, -t, 1),
                                   carry)
                carry = group_side(-t, _roll(N, -t, 1), _roll(P, t, 1),
                                   carry)
        elif dx_mode == "chunk":
            full = pd // T

            def chunk_body(c, carry):
                m = 1 + T * c
                nb_p = _roll(N, m, 1)
                nb_m = _roll(N, -m, 1)
                pb_p = _roll(P, -m, 1)
                pb_m = _roll(P, m, 1)
                for t in range(T):
                    jj = m + t
                    carry = group_side(jj, _roll(nb_p, t, 1),
                                       _roll(pb_p, -t, 1), carry)
                    carry = group_side(-jj, _roll(nb_m, -t, 1),
                                       _roll(pb_m, t, 1), carry)
                return carry

            carry = jax.lax.fori_loop(0, full, chunk_body, carry)
            for t in range(1 + T * full, pd + 1):
                carry = group_side(t, _roll(N, t, 1), _roll(P, -t, 1),
                                   carry)
                carry = group_side(-t, _roll(N, -t, 1), _roll(P, t, 1),
                                   carry)
        else:
            carry = jax.lax.fori_loop(
                1, pd + 1,
                lambda jj, c: group_side(
                    -jj, _roll(N, -jj, 1), _roll(P, jj, 1),
                    group_side(jj, _roll(N, jj, 1), _roll(P, -jj, 1), c)),
                carry, unroll=unroll)

    acc, wacc = carry
    out_ref[:, :] = acc / jnp.maximum(wacc, 1e-12)


def _default_variant() -> str:
    """Default kernel: the static-dy group kernel ('groups'). Measured on
    chip at 2000^2 (tools/exp_nlm_static.py, r05): quad 26.7 ms -> groups
    17.3 ms pipelined with BIT-IDENTICAL output (max|d| = 0) and a 4x
    faster Mosaic compile (232 s -> 57 s cache-cold) — Python-unrolling
    the dy groups turns every sublane roll static and batches the
    leftover dy rows through the same concatenated box-dot/exp as the
    quads."""
    return os.environ.get("HIPRFISH_NLM_KERNEL", "groups")


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 7))
def denoise_nl_means_pallas(
    image: jax.Array,
    h: float = 0.02,
    patch_size: int = 7,
    patch_distance: int = 11,
    block: int = 512,
    interpret: bool = False,
    unroll: int | None = None,
    variant: str | None = None,
):
    """Pallas NLM of an (H, W) image; drop-in for denoise.denoise_nl_means.

    ``interpret``: run under the Pallas interpreter (CPU CI coverage).
    ``unroll``: dx-loop unroll factor; None -> HIPRFISH_NLM_UNROLL env.
    ``variant``: kernel formulation — 'quad' (r04 shipped), or the
    static-dy group kernel as 'groups' / 'groups-chunk' / 'groups-static'
    (see _nlm_kernel_groups); None -> HIPRFISH_NLM_KERNEL env (default
    'quad')."""
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

    variant = variant or _default_variant()
    if variant == "quad":
        kernel = functools.partial(
            _nlm_kernel, bh=bh, bw=bw, halo_y=halo_y, halo_x=halo_x, pd=pd,
            pr=pr, h2=float(h * h),
            unroll=_DX_UNROLL if unroll is None else unroll)
    else:
        dx_mode = {"groups": "fori", "groups-chunk": "chunk",
                   "groups-static": "static"}[variant]
        kernel = functools.partial(
            _nlm_kernel_groups, bh=bh, bw=bw, halo_y=halo_y, halo_x=halo_x,
            pd=pd, pr=pr, h2=float(h * h), dx_mode=dx_mode,
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
