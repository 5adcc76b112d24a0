"""The fused single-program 3D measurement (segment3d.make_fused_measure)
must agree with the per-chunk streamed path and the numpy oracle — CI runs
it under the Pallas interpreter (the banded kernel is TPU-only on
hardware)."""

import numpy as np
import jax
import jax.numpy as jnp

from hiprfish_tpu.pipeline import segment3d


def test_fused_measure_matches_streamed_and_numpy():
    rng = np.random.RandomState(0)
    X, Y, Z, C, mc = 64, 48, 10, 5, 32
    lab = np.zeros((X, Y, Z), np.int32)
    nid = 0
    for x0 in range(0, X, 16):
        for y0 in range(0, Y, 16):
            nid += 1
            lab[x0 + 2:x0 + 10, y0 + 2:y0 + 12, 3:9] = nid
    data = rng.rand(C, Z, X, Y).astype(np.float32)
    data_dev = jnp.asarray(data)

    def loader(z0, zc):
        return jax.lax.dynamic_slice(data_dev, (0, z0, 0, 0),
                                     (C, zc, X, Y))

    run = segment3d.make_fused_measure(loader, (X, Y, Z), 4, C, mc,
                                       interpret=True)  # tail: 10 = 2*4+2
    avg, spill = run(jnp.transpose(jnp.asarray(lab), (2, 0, 1)))
    assert not bool(spill)
    avg = np.asarray(avg)

    streamed = np.asarray(segment3d.measure_volume_streamed(
        jnp.asarray(lab), lambda z0, zc: data[:, z0:z0 + zc], Z, 4, C, mc,
        channels_major=True))
    for i in range(1, nid + 1):
        m = lab == i
        expect = data[:, np.transpose(m, (2, 0, 1))].mean(axis=1)
        np.testing.assert_allclose(avg[i], expect, atol=2e-4)
        np.testing.assert_allclose(streamed[i], expect, atol=2e-4)


def test_fused_measure_signals_band_spill():
    """Labels whose ids straddle more than ``width`` within one raster band
    must flip the spill flag (the caller then redoes measurement through
    the streamed path — bench3d.py, segment3d.make_fused_measure docstring)
    instead of silently mis-accumulating."""
    X = Y = 8
    Z = 4
    C = 2
    mc = 600
    lab = np.zeros((X, Y, Z), np.int32)
    lab[0, 0, :] = 1
    lab[5, 5, :] = 520          # > width=512 from band base id 1
    data = np.random.default_rng(0).random((C, Z, X, Y)).astype(np.float32)

    def loader(z0, zc):
        return jax.lax.dynamic_slice(
            jnp.asarray(data), (0, z0, 0, 0), (C, zc, X, Y))

    run = segment3d.make_fused_measure(loader, (X, Y, Z), 2, C, mc,
                                       interpret=True)
    avg, spill = run(jnp.transpose(jnp.asarray(lab), (2, 0, 1)))
    assert bool(spill)
    # the streamed fallback produces the exact answer for the same volume
    streamed = np.asarray(segment3d.measure_volume_streamed(
        jnp.asarray(lab), lambda z0, zc: data[:, z0:z0 + zc], Z, 2, C, mc,
        channels_major=True))
    expect1 = data[:, :, 0, 0].mean(axis=1)
    np.testing.assert_allclose(streamed[1], expect1, rtol=1e-5)
