"""Parity of the fused single-program ecoli engine vs the host-orchestrated
reference-semantics engine."""

import numpy as np
import pytest
import jax.numpy as jnp

from hiprfish_tpu.config import TEN_BIT, SegmentationConfig
from hiprfish_tpu.pipeline import fused_ecoli, segment2d
from hiprfish_tpu.utils import synthetic

CODES = [5, 37, 515, 1023, 96, 640, 17, 260, 770]


@pytest.mark.slow
def test_fused_ecoli_matches_host_engine():
    fov = synthetic.make_fov(
        TEN_BIT, CODES, shape=(192, 192), seed=1,
        laser_shifts=[(0, 0), (1, -1), (0, 1), (-1, 0), (1, 1)],
        cell_axes=(9.0, 14.0))
    stack = tuple(jnp.asarray(a) for a in fov["stack"])
    cfg = SegmentationConfig()
    seg_f, n_f, reg_f, avg_f = fused_ecoli.segment_ecoli_device(stack, cfg,
                                                                256)
    res_h = segment2d.segment_ecoli(fov["stack"], cfg, 256)
    assert int(n_f) == int(res_h.n_cells) == len(CODES)
    # Same cells: every fused cell overlaps exactly one host cell with IoU>0.8
    a = np.asarray(seg_f)
    b = np.asarray(res_h.segmentation)
    for lab_id in range(1, len(CODES) + 1):
        mask_a = a == lab_id
        ids, cnt = np.unique(b[mask_a], return_counts=True)
        best = ids[np.argmax(cnt)]
        mask_b = b == best
        iou = (mask_a & mask_b).sum() / (mask_a | mask_b).sum()
        assert best > 0 and iou > 0.8, (lab_id, best, iou)
    # The fused engine stores the registered cube in cfg.registered_dtype
    # (bf16 by default): values are the host engine's, quantized.
    np.testing.assert_allclose(
        np.asarray(reg_f, np.float32), np.asarray(res_h.registered),
        rtol=8e-3, atol=1e-3)
    # The measurement the bf16 cube feeds must land on the SAME barcode
    # calls as the host engine's f32 measurement (pins the quantization
    # risk of cfg.registered_dtype at the call level, where parity lives).
    import jax

    from hiprfish_tpu.config import ClassifierConfig
    from hiprfish_tpu.models import train as mtrain
    from hiprfish_tpu.models.classifier import train_classifier
    from hiprfish_tpu.pipeline import measure as pmeasure

    rng = np.random.RandomState(0)
    lut = synthetic.fluorophore_spectra(TEN_BIT)
    rows, code_strs = [], []
    for c in CODES:
        spec = synthetic.barcode_spectrum(TEN_BIT, c, lut)
        r = rng.uniform(0.7, 1.3, (40, 1)) * spec[None, :] \
            + rng.randn(40, TEN_BIT.n_channels) * 0.02
        rows.append(np.clip(r, 0, None))
        code_strs += [TEN_BIT.code_str(c)] * 40
    spectra = np.concatenate(rows).astype(np.float32)
    spectra /= np.maximum(spectra.max(axis=1, keepdims=True), 1e-12)
    spectra = np.concatenate(
        [spectra, np.diff(spectra[:, :32], axis=1)], axis=1)
    checks = mtrain.check_bits_for_codes(TEN_BIT, code_strs)
    clf = train_classifier(jax.random.PRNGKey(0), TEN_BIT, spectra,
                           code_strs, checks,
                           ClassifierConfig(check_train_steps=200),
                           violet_derivative=True)
    _, norm_h = pmeasure.measure_fov(
        res_h.segmentation, res_h.registered, int(res_h.n_cells), 256)
    avg_f = np.asarray(avg_f)[1:len(CODES) + 1]
    norm_f = avg_f / np.maximum(avg_f.max(axis=1, keepdims=True), 1e-12)
    calls_f, _, _, _ = clf.classify(jnp.asarray(norm_f, jnp.float32))
    # host cells may be ordered differently: map via best-overlap
    order = []
    for lab_id in range(1, len(CODES) + 1):
        ids, cnt = np.unique(b[a == lab_id], return_counts=True)
        order.append(int(ids[np.argmax(cnt)]) - 1)
    calls_h, _, _, _ = clf.classify(jnp.asarray(norm_h[order], jnp.float32))
    assert list(calls_f) == list(calls_h)


@pytest.mark.slow
def test_scan_cap_invariance_2d_engine():
    """cfg.scan_cap only changes the id floods' pass/round split, never the
    segmentation (fixpoint exactness) — pinned on the fused 10-bit engine."""
    fov = synthetic.make_fov(TEN_BIT, CODES, shape=(192, 192), seed=1,
                             cell_axes=(9.0, 14.0))
    stack = tuple(jnp.asarray(a) for a in fov["stack"])
    seg64, n64, _, _ = fused_ecoli.segment_ecoli_device(
        stack, SegmentationConfig(), 256)
    seg16, n16, _, _ = fused_ecoli.segment_ecoli_device(
        stack, SegmentationConfig(scan_cap=16), 256)
    assert int(n64) == int(n16)
    np.testing.assert_array_equal(np.asarray(seg64), np.asarray(seg16))


def test_classify_capped_matches_full():
    """classify_capped (static row cap + lax.cond fallback) must agree with
    the uncapped classify_device in both regimes: n_cells under the cap
    (small branch) and at/over it (full-width fallback)."""
    import jax

    from hiprfish_tpu.config import ClassifierConfig
    from hiprfish_tpu.models import train as mtrain
    from hiprfish_tpu.models.classifier import train_classifier
    from hiprfish_tpu.pipeline import fused

    rng = np.random.RandomState(0)
    codes = [5, 37, 515, 1023]
    lut = synthetic.fluorophore_spectra(TEN_BIT)
    rows, cs = [], []
    for c in codes:
        spec = synthetic.barcode_spectrum(TEN_BIT, c, lut)
        r = np.clip(rng.uniform(0.8, 1.2, (12, 1)) * spec[None, :]
                    + rng.randn(12, TEN_BIT.n_channels) * 0.01, 0, None)
        rows.append(r)
        cs += [TEN_BIT.code_str(c)] * 12
    spectra = np.concatenate(rows).astype(np.float32)
    spectra /= np.maximum(spectra.max(axis=1, keepdims=True), 1e-12)
    spectra = np.concatenate(
        [spectra, np.diff(spectra[:, :32], axis=1)], axis=1)
    clf = train_classifier(jax.random.PRNGKey(0), TEN_BIT, spectra, cs,
                           mtrain.check_bits_for_codes(TEN_BIT, cs),
                           ClassifierConfig(check_train_steps=30),
                           violet_derivative=True)
    arrays, static = fused.classifier_to_device_args(clf)
    (n_classes, blocks, check_slice, n_channels, k, temperature,
     check_blocks) = static
    clf_args = (arrays["check_params"], check_blocks,
                arrays.get("scaler_mean"), arrays.get("scaler_scale"),
                arrays["train_features"], arrays["train_labels"],
                n_classes, blocks, check_slice, n_channels, k, temperature)

    n_pad = 64
    feats = np.zeros((n_pad, spectra.shape[1]), np.float32)
    n_real = 7
    feats[1:1 + n_real] = spectra[rng.choice(len(spectra), n_real)]
    feats = jnp.asarray(feats)

    ref_idx, ref_prob = fused.classify_device(feats, *clf_args)
    for n_cells, cap in ((n_real, 16), (20, 16)):
        got_idx, got_prob = fused.classify_capped(
            feats, jnp.int32(n_cells), cap, *clf_args)
        rows_chk = slice(1, 1 + min(n_cells, n_real))
        np.testing.assert_array_equal(np.asarray(got_idx)[rows_chk],
                                      np.asarray(ref_idx)[rows_chk])
        np.testing.assert_allclose(np.asarray(got_prob)[rows_chk],
                                   np.asarray(ref_prob)[rows_chk],
                                   rtol=1e-5)
