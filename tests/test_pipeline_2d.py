"""End-to-end tests of the three 2D segmentation engines + measurement on
synthetic known-barcode FOVs (the reference's validation strategy, SURVEY.md
§4, reproduced synthetically)."""

import numpy as np
import pytest

from hiprfish_tpu.config import SEVEN_BIT, TEN_BIT, SegmentationConfig
from hiprfish_tpu.pipeline import measure, segment2d
from hiprfish_tpu.utils import synthetic

CODES_10B = [5, 37, 515, 1023, 96, 640, 17, 260, 770]
CODES_7B = [1, 9, 65, 127, 34, 88, 5, 96, 18]


def _check_cells(layout, codes, fov, res, min_cells, cos_thresh=0.98):
    n = int(res.n_cells)
    assert n >= min_cells
    seg = np.asarray(res.segmentation)
    truth = fov["truth_labels"]
    avg, norm = measure.measure_fov(res.segmentation, res.registered, n, 256)
    assert avg.shape == (n, layout.n_channels)
    matched = set()
    for lab in range(1, n + 1):
        overl = truth[seg == lab]
        vals, cnt = np.unique(overl[overl > 0], return_counts=True)
        assert len(vals) > 0, f"cell {lab} overlaps no ground-truth cell"
        gt = int(vals[np.argmax(cnt)])
        matched.add(gt)
        spec = synthetic.barcode_spectrum(layout, codes[gt - 1], fov["spectra"])
        cos = norm[lab - 1] @ spec / (
            np.linalg.norm(norm[lab - 1]) * np.linalg.norm(spec)
        )
        assert cos > cos_thresh, f"cell {lab} spectrum mismatch (cos={cos:.3f})"
    assert len(matched) >= min_cells


@pytest.mark.slow
def test_segment_ecoli_end_to_end():
    fov = synthetic.make_fov(
        TEN_BIT, CODES_10B, shape=(192, 192), seed=1,
        laser_shifts=[(0, 0), (2, -1), (0, 3), (-2, 0), (1, 1)],
        cell_axes=(9.0, 14.0),
    )
    res = segment2d.segment_ecoli(fov["stack"], SegmentationConfig(), 256)
    _check_cells(TEN_BIT, CODES_10B, fov, res, min_cells=9)
    # Minor-axis gate: every surviving cell within [15, 35].
    from hiprfish_tpu.ops import regionprops as rp

    props = rp.shape_props_2d(res.segmentation, 256)
    minor = np.asarray(props["minor_axis_length"])[1 : int(res.n_cells) + 1]
    # Cells were double-eroded after the gate, so allow erosion shrinkage.
    assert (minor > 10).all() and (minor < 35).all()


@pytest.mark.slow
def test_segment_lpcv_multispecies_end_to_end():
    fov = synthetic.make_fov(
        SEVEN_BIT, CODES_7B, shape=(192, 192), seed=2,
        laser_shifts=[(0, 0), (1, 2), (-1, 0), (2, -2)],
        cell_axes=(7.0, 12.0),
    )
    res = segment2d.segment_lpcv(fov["stack"], None, SegmentationConfig(), 256)
    _check_cells(SEVEN_BIT, CODES_7B, fov, res, min_cells=9)


@pytest.mark.slow
def test_segment_lpcv_biofilm_end_to_end():
    fov = synthetic.make_fov(
        SEVEN_BIT, CODES_7B, shape=(192, 192), seed=3, cell_axes=(7.0, 12.0)
    )
    res = segment2d.segment_lpcv(
        fov["stack"], None, SegmentationConfig(), 256, "biofilm"
    )
    _check_cells(SEVEN_BIT, CODES_7B, fov, res, min_cells=9)
    # Adjacency segmentation must cover at least the cell segmentation.
    adj = np.asarray(res.adjacency)
    seg = np.asarray(res.segmentation)
    assert (adj[seg > 0] > 0).mean() > 0.95


def test_measurement_matches_direct_mean(rng):
    # measure_fov row ordering: row i-1 is the mean of label i.
    labels = np.zeros((32, 32), np.int32)
    labels[4:10, 4:12] = 1
    labels[20:28, 18:26] = 2
    img = rng.rand(32, 32, 5).astype(np.float32)
    avg, norm = measure.measure_fov(labels, img, 2, 16)
    np.testing.assert_allclose(avg[0], img[labels == 1].mean(0), rtol=1e-5)
    np.testing.assert_allclose(avg[1], img[labels == 2].mean(0), rtol=1e-5)
    np.testing.assert_allclose(norm.max(axis=1), 1.0, rtol=1e-5)
