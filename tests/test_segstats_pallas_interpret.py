"""CI coverage for the TPU Pallas stats/lookup kernels via interpret mode.

These kernels (ops/segstats_pallas.py) back the hot per-label statistics of
every fused engine and the streamed 3D measurement; on hardware they are
validated by tools/tpu_check_statscm.py and the bench accuracy numbers, but
CI runs on CPU where Mosaic cannot execute. ``interpret=True`` runs the
same kernel logic under the Pallas interpreter, so the banding, window
bases, hi/lo split exactness, column order, and spill flags all get
regression coverage on every test run."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hiprfish_tpu.ops import segstats_pallas as sp


def _band_local_labels(h, w, band_px, width, n_per_band=3, seed=0):
    """Labels whose positive ids are window-local per raster band: ids in
    band b lie in [b*width//2 + 1, b*width//2 + width) (overlapping bases
    across bands exercise non-trivial windows)."""
    rng = np.random.RandomState(seed)
    n = h * w
    lab = np.zeros(n, np.int32)
    nb = n // band_px
    for b in range(nb):
        base = b * (width // 2) + 1
        for k in range(n_per_band):
            px = b * band_px + rng.randint(0, band_px, 8)
            lab[px] = base + rng.randint(0, width - 1)
    return lab.reshape(h, w)


def test_lookup_pallas_interpret_matches_gather():
    h, w, band_px, width, nseg = 16, 256, 512, 64, 300
    lab = _band_local_labels(h, w, band_px, width)
    table = np.arange(nseg, dtype=np.float32) * 1.5
    out, spill = sp.lookup_pallas(jnp.asarray(lab), jnp.asarray(table),
                                  width, band_px, nseg, True)
    assert not bool(spill)
    np.testing.assert_allclose(np.asarray(out), table[lab], rtol=0, atol=0)


def test_lookup_pallas_interpret_spills_on_window_violation():
    h, w, band_px, width, nseg = 16, 256, 512, 8, 300
    lab = np.zeros((h, w), np.int32)
    lab[0, 0] = 1
    lab[0, 100] = 250          # same band, 249 apart >> width=8
    _, spill = sp.lookup_pallas(jnp.asarray(lab), jnp.asarray(
        np.arange(nseg, dtype=np.float32)), width, band_px, nseg, True)
    assert bool(spill)


def test_stats_cm_pallas_interpret_matches_numpy():
    h, w, band_px, width, nseg, C = 16, 256, 512, 64, 300, 5
    lab = _band_local_labels(h, w, band_px, width)
    rng = np.random.RandomState(1)
    img = rng.rand(C, h, w).astype(np.float32)
    acc, spill = sp.stats_cm_pallas(jnp.asarray(lab), jnp.asarray(img),
                                    nseg, width, band_px, 1, True)
    assert not bool(spill)
    acc = np.asarray(acc)
    flat = lab.reshape(-1)
    counts = np.bincount(flat, minlength=nseg)[:nseg]
    # row 0 (background) is not meaningful in the cm kernel (background
    # pixels match no one-hot row)
    np.testing.assert_allclose(acc[1:, 0], counts[1:], atol=1e-4)
    for c in range(C):
        sums = np.bincount(flat, weights=img[c].reshape(-1),
                           minlength=nseg)[:nseg]
        # background row 0 is not meaningful (kernel accumulates clipped
        # windows there); compare labels >= 1
        np.testing.assert_allclose(acc[1:, 1 + c], sums[1:], rtol=2e-3,
                                   atol=1e-3)


def test_stats_cm_pallas_interpret_plane_pure_banding():
    """n_planes > 1 pads each plane separately; ids may restart per plane."""
    h, w, band_px, width, nseg, C, planes = 8, 192, 256, 32, 100, 3, 2
    lab = np.stack([_band_local_labels(h, w, band_px, width, seed=s)
                    for s in range(planes)])          # (planes, h, w)
    rng = np.random.RandomState(2)
    img = rng.rand(C, planes, h, w).astype(np.float32)
    acc, spill = sp.stats_cm_pallas(jnp.asarray(lab), jnp.asarray(img),
                                    nseg, width, band_px, planes, True)
    assert not bool(spill)
    acc = np.asarray(acc)
    flat = lab.reshape(-1)
    counts = np.bincount(flat, minlength=nseg)[:nseg]
    np.testing.assert_allclose(acc[1:, 0], counts[1:], atol=1e-4)
    sums = np.bincount(flat, weights=img[1].reshape(-1), minlength=nseg)
    np.testing.assert_allclose(acc[1:, 2], sums[1:nseg], rtol=2e-3,
                               atol=1e-3)


def test_stats_pallas_interpret_full_columns():
    h, w, band_px, width, nseg, C, A = 16, 256, 512, 64, 300, 3, 4
    lab = _band_local_labels(h, w, band_px, width)
    rng = np.random.RandomState(3)
    img = rng.rand(h, w, C).astype(np.float32)
    mask = (rng.rand(h, w) > 0.5).astype(np.float32)
    aux = rng.randint(0, A, (h, w)).astype(np.int32)
    acc, spill = sp.stats_pallas(
        jnp.asarray(lab), jnp.asarray(img), jnp.asarray(aux),
        jnp.asarray(mask), nseg, width, band_px, A, True, True, h, w, True)
    assert not bool(spill)
    acc = np.asarray(acc)
    flat = lab.reshape(-1)

    counts = np.bincount(flat, minlength=nseg)[:nseg]
    np.testing.assert_allclose(acc[1:, 0], counts[1:], atol=1e-4)

    border = np.zeros((h, w), np.float32)
    border[0] = border[-1] = 1
    border[:, 0] = border[:, -1] = 1
    bhits = np.bincount(flat, weights=border.reshape(-1), minlength=nseg)
    np.testing.assert_allclose(acc[1:, 1], bhits[1:nseg], atol=1e-3)

    # moments: [r, c, r^2, c^2, rc]
    rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    for mi, m in enumerate([rr, cc, rr * rr, cc * cc, rr * cc]):
        ms = np.bincount(flat, weights=m.reshape(-1).astype(np.float64),
                         minlength=nseg)
        np.testing.assert_allclose(acc[1:, 2 + mi], ms[1:nseg], rtol=2e-3,
                                   atol=1e-2)

    # masked channel sums, then aux hist, then mask count
    for c in range(C):
        s = np.bincount(flat, weights=(img[..., c] * mask).reshape(-1),
                        minlength=nseg)
        np.testing.assert_allclose(acc[1:, 7 + c], s[1:nseg], rtol=2e-3,
                                   atol=1e-3)
    for a in range(A):
        hist = np.bincount(flat, weights=(aux == a).reshape(-1)
                           .astype(np.float64), minlength=nseg)
        np.testing.assert_allclose(acc[1:, 7 + C + a], hist[1:nseg],
                                   atol=1e-3)
    mc = np.bincount(flat, weights=mask.reshape(-1), minlength=nseg)
    np.testing.assert_allclose(acc[1:, 7 + C + A], mc[1:nseg], atol=1e-3)
