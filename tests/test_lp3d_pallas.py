"""Tests for the fused Pallas 3D LP-CV kernel (ops/lp3d_pallas.py).

The kernel itself is TPU-only (manual DMA + Mosaic); on the CPU test mesh
we verify the selection network — the only nontrivial algorithmic piece —
against full sorts, and that the chunked dispatcher still takes the XLA
path. A TPU-gated case compares the kernel against the XLA chunk sweep."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hiprfish_tpu.ops import lp3d_pallas


def test_selection_network_exact_order_statistics(rng):
    for n, outs in [(72, (17, 18, 53, 54)), (6, (1, 2, 3, 4)),
                    (9, (2, 6)), (24, (5, 6, 17, 18))]:
        net = lp3d_pallas.selection_network(n, outs)
        for trial in range(200):
            v = (rng.rand(n) if trial % 2
                 else rng.randint(0, 5, n)).astype(np.float32)
            w = v.copy()
            for a, b in net:
                w[a], w[b] = min(w[a], w[b]), max(w[a], w[b])
            s = np.sort(v)
            for r in outs:
                assert w[r] == s[r]


def test_quartile_ranks_match_reference_percentile(rng):
    # interpolation weights must reproduce np.percentile(..., (25, 75))
    for t in (6, 9, 72):
        (lo25, hi25, f25), (lo75, hi75, f75) = lp3d_pallas._quartile_ranks(t)
        v = np.sort(rng.rand(t))
        lq = v[lo25] * (1 - f25) + v[hi25] * f25
        uq = v[lo75] * (1 - f75) + v[hi75] * f75
        np.testing.assert_allclose(lq, np.percentile(v, 25), rtol=1e-6)
        np.testing.assert_allclose(uq, np.percentile(v, 75), rtol=1e-6)


def test_chunked_dispatch_cpu_takes_xla_path(rng):
    # on CPU the dispatcher must not attempt the TPU kernel
    from hiprfish_tpu.config import SegmentationConfig
    from hiprfish_tpu.pipeline import segment3d

    vol = jnp.asarray(rng.rand(24, 28, 12).astype(np.float32))
    out = segment3d.lp_cv_enhance_3d_chunked(
        vol, SegmentationConfig(patch_size=5, theta_range=3, phi_range=3),
        chunk_xy=16)
    assert out.shape == vol.shape and out.dtype == jnp.float32


def test_fused_kernel_matches_xla_sweep_tpu(rng):
    if jax.default_backend() in ("cpu", "gpu"):
        pytest.skip("fused LP-CV kernel is TPU-only")
    from hiprfish_tpu.config import SegmentationConfig
    from hiprfish_tpu.pipeline import segment3d

    vol = jnp.asarray(rng.rand(64, 80, 40).astype(np.float32))
    ref = np.asarray(segment3d._lp_cv_3d_device(vol, 11, 9, 9, 64, True))
    got = np.asarray(lp3d_pallas.lp_cv_enhance_3d_fused(vol, 11, 9, 9))
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_measure_volume_streamed_cm_matches_numpy(rng):
    # CPU takes the scatter path; on TPU the same call runs the banded
    # stats_cm_pallas kernel — both must match the numpy oracle.
    from hiprfish_tpu.pipeline import segment3d

    X, Y, Z, C, mc = 64, 48, 10, 5, 32
    lab = np.zeros((X, Y, Z), np.int32)
    nid = 0
    for x0 in range(0, X, 16):
        for y0 in range(0, Y, 16):
            nid += 1
            lab[x0 + 2:x0 + 10, y0 + 2:y0 + 12, 3:9] = nid
    data = rng.rand(C, Z, X, Y).astype(np.float32)

    avg = np.asarray(segment3d.measure_volume_streamed(
        jnp.asarray(lab), lambda z0, zc: jnp.asarray(data[:, z0:z0 + zc]),
        Z, 2, C, mc, channels_major=True))
    for i in range(1, nid + 1):
        m = lab == i
        expect = data[:, np.transpose(m, (2, 0, 1))].mean(axis=1)
        np.testing.assert_allclose(avg[i], expect, atol=1e-4)
