"""Biofilm 2D measurement (adjacency matrix, debris filter, cell_information
schema) and the 3D segmentation family on synthetic volumes."""

import numpy as np
import pandas as pd
import pytest
import jax.numpy as jnp

from hiprfish_tpu.config import SEVEN_BIT, ClassifierConfig, SegmentationConfig
from hiprfish_tpu.models import train as mtrain
from hiprfish_tpu.models.classifier import train_classifier
from hiprfish_tpu.pipeline import biofilm, segment3d
from hiprfish_tpu.utils import synthetic

CODES = [1, 9, 65, 127, 34, 88]


def _quick_classifier(codes, seed=0):
    layout = SEVEN_BIT
    rng = np.random.RandomState(seed)
    lut = synthetic.fluorophore_spectra(layout)
    rows, code_strs = [], []
    for c in codes:
        spec = synthetic.barcode_spectrum(layout, c, lut)
        r = rng.uniform(0.7, 1.3, (40, 1)) * spec[None, :] \
            + rng.randn(40, layout.n_channels) * 0.02
        rows.append(np.clip(r, 0, None))
        code_strs += [layout.code_str(c)] * 40
    spectra = np.concatenate(rows).astype(np.float32)
    spectra /= np.maximum(spectra.max(axis=1, keepdims=True), 1e-12)
    checks = mtrain.check_bits_for_codes(layout, code_strs)
    import jax

    return train_classifier(jax.random.PRNGKey(0), layout, spectra,
                            code_strs, checks,
                            ClassifierConfig(check_train_steps=200))


def _taxon_lookup(codes):
    return biofilm.make_taxon_lookup(pd.DataFrame({
        "target_taxon": [100 + i for i in range(len(codes))],
        "code": [SEVEN_BIT.code_str(c) for c in codes],
    }))


def test_adjacency_label_pairs():
    seg = np.zeros((8, 8), np.int32)
    seg[1:4, 1:4] = 1
    seg[1:4, 4:7] = 2   # touches 1
    seg[6:8, 6:8] = 3   # isolated
    pairs = biofilm.adjacency_label_pairs(seg)
    assert pairs.tolist() == [[1, 2]]


def test_adjacency_matrix_from_pairs():
    lookup = _taxon_lookup([1, 9])
    pairs = np.array([[1, 2], [2, 3]])
    codes = ["0000001", "0001001", "0000001"]
    mat, mat_f = biofilm.adjacency_matrix_from_pairs(
        pairs, codes, lookup, ["cell", "cell", "debris"])
    c1, c9 = SEVEN_BIT.code_str(1), SEVEN_BIT.code_str(9)
    assert mat.loc[c1, c9] == 2  # edges (1,2) and (2,3)
    assert mat.loc[c9, c1] == 2
    assert mat_f.loc[c1, c9] == 1  # (2,3) filtered out


@pytest.mark.slow
def test_biofilm_2d_measurement_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    clf = _quick_classifier(CODES)
    lookup = _taxon_lookup(CODES)
    fov = synthetic.make_fov(SEVEN_BIT, CODES, shape=(192, 192), seed=5,
                             cell_axes=(7.0, 12.0))
    cell_info = biofilm.measure_biofilm_images_2d(
        "sampleA", clf, lookup, image_stack=fov["stack"],
        max_cells=256, save_png=False)
    assert cell_info.shape[0] >= len(CODES)
    # Schema: channels, check bits, barcode, probs, shape columns, type.
    for col in ("cell_barcode", "max_probability", "centroid_x", "minor_axis",
                "area", "max_intensity", "type"):
        assert col in cell_info.columns
    import os

    for suffix in ("_seg.npy", "_adjacency_seg.npy", "_epithelial_area.npy",
                   "_avgint.csv", "_cell_information.csv",
                   "_cell_information_filtered.csv", "_adjacency_matrix.csv"):
        assert os.path.exists("sampleA" + suffix), suffix
    # Barcode calls correct for confident cells.
    good = cell_info[cell_info.max_probability > 0.95]
    want = {SEVEN_BIT.code_str(c) for c in CODES}
    assert set(good.cell_barcode) <= want
    assert len(set(good.cell_barcode)) >= 4


def _make_volume_stack(codes, shape=(64, 64, 24), seed=0):
    """Synthetic per-laser (X, Y, Z, C_l) volumes with ellipsoidal cells."""
    layout = SEVEN_BIT
    rng = np.random.RandomState(seed)
    x, y, z = shape
    lut = synthetic.fluorophore_spectra(layout)
    vol = rng.rand(x, y, z, layout.n_channels).astype(np.float32) * 0.01
    truth = np.zeros(shape, np.int32)
    grid = int(np.ceil(len(codes) ** 0.5))
    xs = np.linspace(12, x - 12, grid)
    ys = np.linspace(12, y - 12, grid)
    xx, yy, zz = np.mgrid[:x, :y, :z]
    for i, c in enumerate(codes):
        cx, cy, cz = xs[i // grid], ys[i % grid], z / 2
        r2 = (((xx - cx) / 6.0) ** 2 + ((yy - cy) / 4.0) ** 2
              + ((zz - cz) / 5.0) ** 2)
        inside = r2 <= 1.0
        spec = synthetic.barcode_spectrum(layout, c, lut)
        profile = np.where(inside, 1.0 - 0.2 * np.sqrt(np.clip(r2, 0, 1)), 0.0)
        vol += profile[..., None] * spec[None, None, None, :]
        truth[inside & (truth == 0)] = i + 1
    stack = [vol[..., lo:hi] for lo, hi in layout.blocks]
    return stack, truth


@pytest.mark.slow
def test_segment_3d_volume():
    codes = [1, 9, 65, 127]
    stack, truth = _make_volume_stack(codes)
    seg, n_cells, registered, enhanced = segment3d.segment_3d(
        stack, SegmentationConfig(kmeans_iters=20), max_cells=64, chunk_xy=32)
    n = int(n_cells)
    assert n >= len(codes)
    seg = np.asarray(seg)
    # Every ground-truth cell should overlap a segmented cell.
    hit = 0
    for t in range(1, len(codes) + 1):
        labs = seg[truth == t]
        hit += (labs > 0).mean() > 0.3
    assert hit >= len(codes) - 1


def test_register_tstack_average():
    rng = np.random.RandomState(0)
    base = rng.rand(32, 32, 8, 3).astype(np.float32)
    import scipy.ndimage as ndi

    base = ndi.gaussian_filter(base, (2, 2, 1, 0)).astype(np.float32)
    moved = np.roll(base, (2, -1, 0), axis=(0, 1, 2))
    avg = np.asarray(segment3d.register_tstack_average([base, moved]))
    # Registered average should be closer to base than the naive average.
    naive = (base + moved) / 2
    err_reg = np.abs(avg[4:-4, 4:-4] - base[4:-4, 4:-4]).mean()
    err_naive = np.abs(naive[4:-4, 4:-4] - base[4:-4, 4:-4]).mean()
    assert err_reg < err_naive


def test_stitch_tiles_blend():
    rng = np.random.RandomState(0)
    tile = rng.rand(20, 20, 4).astype(np.float32)
    mask = np.ones_like(tile, bool)
    out = segment3d.stitch_tiles(
        [tile, tile, tile, tile], [mask] * 4, (2, 2), (20, 20, 4),
        overlap=4, out_shape=(60, 60, 24), pad=10)
    assert out.shape == (60, 60, 24)
    assert out.max() <= tile.max() + 1e-5  # blending never exceeds inputs


def test_stitch_tiles_device_and_streamed_measurement():
    """Device stitcher reconstructs a volume exactly from aligned tiles and
    recovers known per-tile misalignments; streamed volumetric measurement
    recovers per-cell barcode spectra from generated z-slabs."""
    import jax
    import jax.numpy as jnp
    from hiprfish_tpu.config import SEVEN_BIT
    from hiprfish_tpu.utils import synthetic, synthetic3d as s3
    from hiprfish_tpu.pipeline import segment3d

    spec = s3.VolumeSpec(shape=(180, 180, 40), spacing=(45, 45, 40),
                         jitter=(3., 3., 3.), semi_axes_lo=(10., 6., 8.),
                         semi_axes_hi=(12., 8., 10.), seed=3)
    codes = list(range(1, 64))
    lut = np.stack([synthetic.barcode_spectrum(SEVEN_BIT, c) for c in codes])
    vol = s3.build_sum_volume(spec, len(codes), lut.sum(axis=1), seed=1,
                              z_chunk=16)

    # 2x2 tiles, 40-px overlap (tile 110, step 70).
    tiles = [vol[i * 70:i * 70 + 110, j * 70:j * 70 + 110, :]
             for i in range(2) for j in range(2)]
    st = segment3d.stitch_tiles_device(tiles, (2, 2), 40, (180, 180, 40),
                                       pad=4)
    err = float(jnp.abs(st[4:184, 4:184, 4:44] - vol).max())
    assert err == 0.0

    # Misaligned tiles: stitching must recover the rolls. Rolled wrap strips
    # are flagged invalid via tile masks (the microscope-frame validity
    # contract of the host stitch_tiles).
    shifts = [(0, 0, 0), (2, -1, 1), (-1, 2, 0), (1, 1, -1)]
    tiles2 = [jnp.roll(t, s, axis=(0, 1, 2)) for t, s in zip(tiles, shifts)]

    def wrap_mask(s):
        m = np.ones((110, 110, 40), np.float32)
        for ax, sh in enumerate(s):
            sl = [slice(None)] * 3
            if sh > 0:
                sl[ax] = slice(0, sh)
            elif sh < 0:
                sl[ax] = slice(sh, None)
            else:
                continue
            m[tuple(sl)] = 0.0
        return m

    st2 = segment3d.stitch_tiles_device(
        tiles2, (2, 2), 40, (180, 180, 40), pad=6,
        tile_masks=[wrap_mask(s) for s in shifts])
    inner = (slice(12, 168), slice(12, 168), slice(4, 36))
    err2 = float(jnp.abs(st2[6:186, 6:186, 6:46][inner] - vol[inner]).max())
    assert err2 < 1e-5, err2  # blend-division rounding only

    # Streamed measurement against the analytic truth labels.
    truth, code_idx, _ = s3.truth_chunk(spec, len(codes), 0, 40)
    key = jax.random.PRNGKey(1)
    loader = lambda z0, zc: s3.channel_chunk(
        spec, len(codes), z0, zc, jnp.asarray(lut, jnp.float32), key)
    avg = np.asarray(segment3d.measure_volume_streamed(
        truth, loader, 40, 16, 63, 64))
    # channels-major path must produce identical means (same data,
    # transposed — channel_chunk_cm's own noise draw differs by shape)
    loader_cm = lambda z0, zc: jnp.transpose(
        loader(z0, zc), (3, 2, 0, 1))
    # and the cm fixture builder itself must be layout-consistent
    cm = np.asarray(s3.channel_chunk_cm(
        spec, len(codes), 0, 4, jnp.asarray(lut, jnp.float32), key))
    direct = np.asarray(loader(0, 4))
    np.testing.assert_allclose(
        cm.mean(axis=(1, 2, 3)), direct.mean(axis=(0, 1, 2)), atol=1e-3)
    # the dtype arg must be STATIC: passing the jnp.bfloat16 scalar-meta as
    # a traced arg raised TypeError in the bench's bf16 measure stream
    # (BENCH r05 3d config failure, 2026-08-20)
    cm_bf = s3.channel_chunk_cm(
        spec, len(codes), 0, 4, jnp.asarray(lut, jnp.float32), key,
        jnp.bfloat16)
    assert cm_bf.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(cm_bf, np.float32), cm,
                               rtol=1e-2, atol=2e-2)
    avg_cm = np.asarray(segment3d.measure_volume_streamed(
        truth, loader_cm, 40, 16, 63, 64, channels_major=True))
    np.testing.assert_allclose(avg_cm, avg, rtol=1e-5, atol=1e-6)
    node_code = s3.node_codes(spec, len(codes))
    lut_n = lut / np.linalg.norm(lut, axis=1, keepdims=True)
    for lab in range(1, spec.n_cells + 1):
        v = avg[lab] / (np.linalg.norm(avg[lab]) + 1e-30)
        assert int(np.argmax(lut_n @ v)) == int(node_code[lab - 1])


@pytest.mark.slow
def test_segment_3d_tiled_matches_full_volume():
    """The margin-tiled engine must agree with the whole-volume program:
    same cell count, and every full-volume cell maps 1:1 onto a tiled cell
    (IoU > 0.9) — including cells straddling tile boundaries, which exercise
    the union-find merge."""
    codes = [1, 9, 65, 127, 3, 5, 17, 33, 64]
    stack, truth = _make_volume_stack(codes, shape=(144, 96, 40))
    vol_sum = jnp.sum(segment3d.register_volume_stack(stack), axis=3)
    cfg = SegmentationConfig(kmeans_iters=20)
    seg_f, n_f, _ = segment3d.segment_3d_from_sum(vol_sum, cfg, 64,
                                                  chunk_xy=48)
    seg_t, n_t, enh = segment3d.segment_3d_tiled(vol_sum, cfg, 64,
                                                 tile_x=48, margin=32,
                                                 tile_cap=64, chunk_xy=48)
    assert enh is None
    assert int(n_t) == int(n_f)
    f = np.asarray(seg_f)
    t = np.asarray(seg_t)
    assert ((f > 0) == (t > 0)).mean() > 0.999
    used = set()
    for v in range(1, int(n_f) + 1):
        sel = f == v
        vals, cnt = np.unique(t[sel], return_counts=True)
        best = vals[np.argmax(cnt)]
        assert best > 0
        inter = (sel & (t == best)).sum()
        union = (sel | (t == best)).sum()
        assert inter / union > 0.9, v
        assert best not in used  # bijective: no two cells merged
        used.add(best)


def test_boundary_pair_codes_matches_numpy():
    """The on-device unique-pair extraction must reproduce the host
    reference: for each boundary, exactly the set of
    left_rank * tile_cap + right_rank codes where the owning tile's private
    labeling joins the two planes and both crops are foreground."""
    rng = np.random.RandomState(3)
    tile_cap = 64
    tiles = tuple(jnp.asarray(rng.randint(0, 9, (5, 12, 16)), jnp.int32)
                  for _ in range(3))
    planes = jnp.asarray(rng.randint(0, 5, (3, 2, 12, 16)), jnp.int32)
    codes, n_uni = segment3d._boundary_pair_codes(tiles, planes,
                                                  tile_cap, 32)
    codes, n_uni = np.asarray(codes), np.asarray(n_uni)
    for t in range(2):
        a, b = np.asarray(tiles[t][-1]), np.asarray(tiles[t + 1][0])
        priv = np.asarray(planes[t])
        same = (priv[0] == priv[1]) & (priv[0] > 0) & (a > 0) & (b > 0)
        expect = np.unique(a[same].astype(np.int64) * tile_cap + b[same])
        assert n_uni[t] == len(expect)
        np.testing.assert_array_equal(np.sort(codes[t][codes[t] > 0]),
                                      np.sort(expect))


def test_tiled_merge_pair_cap_spill_fallback(monkeypatch):
    """When a boundary overflows the device pair cap, the merge must fall
    back to the full-plane transfer path and produce the identical
    segmentation (spill forced by inflating the reported unique counts)."""
    codes = [1, 9, 65, 127, 3, 5, 17, 33, 64]
    stack, _ = _make_volume_stack(codes, shape=(144, 96, 40))
    vol_sum = jnp.sum(segment3d.register_volume_stack(stack), axis=3)
    cfg = SegmentationConfig(kmeans_iters=20)
    kw = dict(max_cells=64, tile_x=48, margin=32, tile_cap=64, chunk_xy=48)
    seg_a, n_a, _ = segment3d.segment_3d_tiled(vol_sum, cfg, **kw)
    orig = segment3d._boundary_pair_codes

    def force_spill(tiles, planes, tile_cap, cap):
        pair_codes, n = orig(tiles, planes, tile_cap, cap)
        return pair_codes, n + segment3d._PAIR_CAP

    monkeypatch.setattr(segment3d, "_boundary_pair_codes", force_spill)
    seg_b, n_b, _ = segment3d.segment_3d_tiled(vol_sum, cfg, **kw)
    assert int(n_a) == int(n_b)
    np.testing.assert_array_equal(np.asarray(seg_a), np.asarray(seg_b))


@pytest.mark.slow
def test_tiled_global_seeds_matches_in_tile_seeds(monkeypatch):
    """The hoisted full-volume seed mask (_global_seeds + seeded tile
    program) must reproduce the in-tile opening/fill path exactly: the
    margins make the in-tile seeds exact for any structure narrower than
    the margin, and full-volume fill is the untiled semantics itself."""
    codes = [1, 9, 65, 127, 3, 5]
    stack, _ = _make_volume_stack(codes, shape=(144, 96, 40))
    vol_sum = jnp.sum(segment3d.register_volume_stack(stack), axis=3)
    cfg = SegmentationConfig(kmeans_iters=20)
    kw = dict(max_cells=64, tile_x=48, margin=32, tile_cap=64, chunk_xy=48)
    monkeypatch.setenv("HIPRFISH_3D_GLOBAL_SEEDS", "0")
    seg_off, n_off, _ = segment3d.segment_3d_tiled(vol_sum, cfg, **kw)
    monkeypatch.setenv("HIPRFISH_3D_GLOBAL_SEEDS", "1")
    seg_on, n_on, _ = segment3d.segment_3d_tiled(vol_sum, cfg, **kw)
    assert int(n_on) == int(n_off)
    np.testing.assert_array_equal(np.asarray(seg_on), np.asarray(seg_off))
    # a tighter id-flood scan cap only adds fixpoint iterations, never
    # changes the result (exactness held by the while_loop)
    monkeypatch.setenv("HIPRFISH_3D_SCAN_CAP", "8")
    seg_cap, n_cap, _ = segment3d.segment_3d_tiled(vol_sum, cfg, **kw)
    assert int(n_cap) == int(n_on)
    np.testing.assert_array_equal(np.asarray(seg_cap), np.asarray(seg_on))
