"""One-shot TPU validation of stats_cm_pallas + the banded streamed measure.

Runs on the real chip (no JAX_PLATFORMS override): correctness vs a numpy
oracle at small scale, then device timing at production plane scale
(2020^2 x 63 channels), comparing against the scatter formulation.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from hiprfish_tpu.ops import segstats_pallas as sp
from hiprfish_tpu.pipeline import segment3d
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import device_time_ms  # noqa: F401 (import check)


def main():
    print("devices:", jax.devices())
    rng = np.random.RandomState(0)

    # --- correctness: small banded case with in-window labels ---
    X, Y, C, mc, width = 256, 200, 7, 64, 32
    lab = np.zeros((X, Y), np.int32)
    nid = 0
    for x0 in range(0, X, 32):
        for y0 in range(0, Y, 40):
            nid += 1
            lab[x0 + 2:x0 + 20, y0 + 3:y0 + 30] = min(nid, mc - 1)
    img = rng.rand(C, X, Y).astype(np.float32) * 100
    out, spill = sp.stats_cm_pallas(jnp.asarray(lab), jnp.asarray(img),
                                    mc, width, 1024)
    out = np.asarray(out)
    assert not bool(spill), "unexpected spill"
    for i in range(1, min(nid + 1, mc)):
        m = lab == i
        np.testing.assert_allclose(out[i, 0], m.sum(), rtol=1e-6)
        np.testing.assert_allclose(out[i, 1:], img[:, m].sum(axis=1),
                                   rtol=2e-5)
    print("correctness: OK (max id", min(nid, mc - 1), ")")

    # --- spill fallback via measure_volume_streamed ---
    Xs, Ys, Zs, Cs, mcs = 64, 48, 6, 5, 32
    lab3 = np.zeros((Xs, Ys, Zs), np.int32)
    k = 0
    for x0 in range(0, Xs, 16):
        for y0 in range(0, Ys, 16):
            k += 1
            lab3[x0 + 2:x0 + 10, y0 + 2:y0 + 12, 1:5] = k
    data = rng.rand(Cs, Zs, Xs, Ys).astype(np.float32)
    avg = np.asarray(segment3d.measure_volume_streamed(
        jnp.asarray(lab3), lambda z0, zc: jnp.asarray(data[:, z0:z0 + zc]),
        Zs, 2, Cs, mcs, channels_major=True))
    for i in range(1, k + 1):
        m = lab3 == i
        np.testing.assert_allclose(
            avg[i], data[:, np.transpose(m, (2, 0, 1))].mean(axis=1),
            atol=1e-4)
    print("streamed measure: OK")

    # --- timing at production plane scale ---
    P, C, mc, width = 2020, 63, 16384, 512
    lab = np.zeros((P, P), np.int32)
    ncell = 0
    for x0 in range(10, P - 30, 45):
        for y0 in range(10, P - 30, 45):
            ncell += 1
            lab[x0:x0 + 30, y0:y0 + 22] = ncell % (mc - width)
    img = rng.rand(C, P, P).astype(np.float32)
    labd, imgd = jnp.asarray(lab), jnp.asarray(img)
    f = jax.jit(lambda l, i: sp.stats_cm_pallas(l, i, mc, width, 8192)[0])
    t0 = time.time()
    r = f(labd, imgd)
    r.block_until_ready()
    print(f"compile+run: {time.time() - t0:.1f}s")
    ts = []
    for _ in range(5):
        t0 = time.time()
        f(labd, imgd)[0].block_until_ready()
        ts.append(time.time() - t0)
    print(f"stats_cm_pallas plane {P}x{P}x{C}: "
          f"{min(ts) * 1e3:.1f} ms best of 5 {[f'{t*1e3:.0f}' for t in ts]}")

    acc0 = jnp.zeros((mc, 1 + C), jnp.float32)
    g = segment3d._accumulate_planes_banded
    lab2 = jnp.stack([labd, labd])                     # (2, P, P) chunk
    img2 = jnp.stack([imgd, imgd], axis=1)             # (C, 2, P, P)
    t0 = time.time()
    g(acc0, lab2, img2, width, 2).block_until_ready()
    print(f"accumulate 2-plane compile+run: {time.time() - t0:.1f}s")
    ts = []
    for _ in range(5):
        t0 = time.time()
        g(acc0, lab2, img2, width, 2).block_until_ready()
        ts.append(time.time() - t0)
    print(f"accumulate_planes_banded (2 planes): {min(ts) * 1e3:.1f} ms "
          f"best of 5 ({min(ts) * 5e2:.1f} ms/plane)")
    print("ALL OK")


if __name__ == "__main__":
    main()
