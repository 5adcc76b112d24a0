"""A/B the 10-bit register-stage formulations on the real chip (VERDICT r05
ask #3: the stage table names register 27.5 ms as the top 10-bit cost).

Variants (all produce (registered, image_cn) with identical semantics up to
float-add order in image_cn):
  base    : shipped formulation (max-project full planes, crop, FFT, roll
            each laser, concat, overlap-multiply, 95-ch sum, log)
  crop1st : crop the raw planes BEFORE the max projection (the projection
            is only consumed at the crop, so the full-plane reduce is
            1.4 GB of dead HBM read unless XLA sinks the slice)
  sum2d   : + fov_sum built from rolled per-laser 2D channel-sums instead
            of re-reading the 1.5 GB registered buffer (sum of roll == roll
            of sum; the overlap mask distributes: overlap = AND of valids)
  dus     : + write rolled planes into a preallocated (H, W, 95) buffer via
            dynamic_update_slice instead of concatenate
  bf16    : sum2d + registered stored bf16 (halves concat write + stats
            read traffic; measurement accuracy impact measured separately)

Usage: python tools/exp_register.py [--size 2000]
"""

from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("HIPRFISH_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from hiprfish_tpu.utils.platform import apply_platform_env

apply_platform_env()

from _timing import device_time_ms  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2000)
    ap.add_argument("--cells", type=int, default=400)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hiprfish_tpu.config import TEN_BIT, SegmentationConfig
    from hiprfish_tpu.ops import register as reg
    from hiprfish_tpu.utils import synthetic

    layout = TEN_BIT
    cfg = SegmentationConfig()
    size = args.size
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache",
        f"fov_10b_{size}_{args.cells}_v1.npz")
    if os.path.exists(cache):
        with np.load(cache) as z:
            planes = [z[f"stack_{i}"] for i in range(int(z["n_lasers"]))]
    else:
        all_codes = list(range(1, 1024))
        cell_codes = [all_codes[(i * 37) % 1023] for i in range(args.cells)]
        fov = synthetic.make_fov(
            layout, cell_codes, shape=(size, size), seed=2,
            laser_shifts=[(0, 0), (2, -1), (0, 3), (-2, 0), (1, 1)],
            cell_axes=(9.0, 14.0))
        planes = [np.asarray(a, np.float32) for a in fov["stack"]]
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        np.savez(cache + ".tmp.npz", n_lasers=len(planes),
                 truth_labels=fov["truth_labels"],
                 **{f"stack_{i}": p for i, p in enumerate(planes)})
        os.replace(cache + ".tmp.npz", cache)
    stack = tuple(jax.device_put(p) for p in planes)
    jax.block_until_ready(stack)
    print(f"# fixture {size}^2 x {len(stack)} lasers on "
          f"{jax.devices()[0].device_kind}", file=sys.stderr)

    h = w = size
    c = cfg.register_crop
    r0, c0 = (h - c) // 2, (w - c) // 2
    _crop2 = lambda im: jax.lax.slice(im, (r0, c0), (r0 + c, c0 + c))
    _crop3 = lambda im: jax.lax.slice(
        im, (r0, c0, 0), (r0 + c, c0 + c, im.shape[2]))

    def _shifts_base(stack):
        projections = [jnp.max(img, axis=2) for img in stack]
        cref = _crop2(projections[0])
        return [reg.clamp_shift(
            reg.register_translation(cref, _crop2(projections[i])),
            cfg.max_shift) for i in range(1, len(stack))]

    def _shifts_crop1st(stack):
        projections = [jnp.max(_crop3(img), axis=2) for img in stack]
        return [reg.clamp_shift(
            reg.register_translation(projections[0], projections[i]),
            cfg.max_shift) for i in range(1, len(stack))]

    @jax.jit
    def base(stack):
        shifts = _shifts_base(stack)
        parts = [stack[0]]
        overlap = jnp.ones((h, w), bool)
        for i in range(1, len(stack)):
            shifted, mask = reg.apply_shift_2d(stack[i], shifts[i - 1])
            parts.append(shifted)
            overlap = overlap & mask
        registered = jnp.concatenate(parts, axis=2) * overlap[:, :, None]
        registered = jax.lax.optimization_barrier(registered)
        fov_sum = jnp.sum(registered, axis=2)
        return registered, jnp.log(fov_sum + 1e-2)

    @jax.jit
    def crop1st(stack):
        shifts = _shifts_crop1st(stack)
        parts = [stack[0]]
        overlap = jnp.ones((h, w), bool)
        for i in range(1, len(stack)):
            shifted, mask = reg.apply_shift_2d(stack[i], shifts[i - 1])
            parts.append(shifted)
            overlap = overlap & mask
        registered = jnp.concatenate(parts, axis=2) * overlap[:, :, None]
        registered = jax.lax.optimization_barrier(registered)
        fov_sum = jnp.sum(registered, axis=2)
        return registered, jnp.log(fov_sum + 1e-2)

    def _sum2d_core(stack, dtype):
        shifts = _shifts_crop1st(stack)
        sums2d = [jnp.sum(img, axis=2) for img in stack]
        parts = [stack[0].astype(dtype)]
        fov_sum = sums2d[0]
        overlap = jnp.ones((h, w), bool)
        for i in range(1, len(stack)):
            s = shifts[i - 1]
            shifted, mask = reg.apply_shift_2d(stack[i].astype(dtype), s)
            parts.append(shifted)
            fov_sum = fov_sum + reg.apply_shift_2d(sums2d[i], s)[0]
            overlap = overlap & mask
        registered = jnp.concatenate(parts, axis=2) \
            * overlap[:, :, None].astype(dtype)
        registered = jax.lax.optimization_barrier(registered)
        fov_sum = fov_sum * overlap
        return registered, jnp.log(fov_sum + 1e-2)

    @jax.jit
    def sum2d(stack):
        return _sum2d_core(stack, jnp.float32)

    @jax.jit
    def bf16(stack):
        return _sum2d_core(stack, jnp.bfloat16)

    @jax.jit
    def dus(stack):
        shifts = _shifts_crop1st(stack)
        sums2d = [jnp.sum(img, axis=2) for img in stack]
        nch = sum(im.shape[2] for im in stack)
        registered = jnp.zeros((h, w, nch), jnp.float32)
        registered = jax.lax.dynamic_update_slice(
            registered, stack[0], (0, 0, 0))
        fov_sum = sums2d[0]
        overlap = jnp.ones((h, w), bool)
        off = stack[0].shape[2]
        for i in range(1, len(stack)):
            s = shifts[i - 1]
            shifted, mask = reg.apply_shift_2d(stack[i], s)
            registered = jax.lax.dynamic_update_slice(
                registered, shifted, (0, 0, off))
            off += stack[i].shape[2]
            fov_sum = fov_sum + reg.apply_shift_2d(sums2d[i], s)[0]
            overlap = overlap & mask
        registered = registered * overlap[:, :, None]
        registered = jax.lax.optimization_barrier(registered)
        fov_sum = fov_sum * overlap
        return registered, jnp.log(fov_sum + 1e-2)

    ref_out = None
    for name, fn in [("base", base), ("crop1st", crop1st), ("sum2d", sum2d),
                     ("dus", dus), ("bf16", bf16)]:
        t, out = device_time_ms(fn, stack, n=8, reps=3, warmup=1)
        cn = np.asarray(out[1], np.float32)
        if ref_out is None:
            ref_out = cn
            diff = 0.0
        else:
            diff = float(np.max(np.abs(cn - ref_out)))
        print(f"{name:<10} {t:7.2f} ms   max|dcn|={diff:.2e}", flush=True)


if __name__ == "__main__":
    main()
