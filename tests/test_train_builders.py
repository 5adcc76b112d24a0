"""Coverage of the full load_training_data* builder family: every
reference builder name resolves through models.train.REFERENCE_BUILDERS and
the distinguishing variants train a classifier that recovers its own
simulated class means (train_reference.py:57-2251)."""

import glob
import os

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from hiprfish_tpu.config import (TEN_BIT, ClassifierConfig, convert_code_to_7b,
                                 convert_code_to_10b)
from hiprfish_tpu.models import train as mtrain
from hiprfish_tpu.utils import synthetic

CODES = [5, 37, 515, 96, 640, 17, 260, 770]
CFG = ClassifierConfig(check_train_steps=60)


@pytest.fixture(scope="module")
def ref_folder(tmp_path_factory):
    folder = tmp_path_factory.mktemp("ref") / "hiprfish_1023_reference"
    folder.mkdir()
    synthetic.write_reference_folder(TEN_BIT, str(folder), CODES,
                                     cells_per_code=30, seed=0)
    # the *_norm.csv convention some variants glob (Snakefile select path)
    for f in glob.glob(os.path.join(str(folder), "*_avgint.csv")):
        rows = np.loadtxt(f, delimiter=",", ndmin=2)
        rows = rows / np.maximum(rows.max(axis=1, keepdims=True), 1e-12)
        np.savetxt(f[: -len(".csv")] + "_norm.csv", rows, delimiter=",")
    return str(folder)


def _self_accuracy(clf, folder):
    """Classify each code's measured mean spectrum; all must come back."""
    stats = mtrain.load_reference_stats(folder)
    encs = sorted(e for e in stats
                  if clf.layout_name != "seven_bit"
                  or TEN_BIT.code_str(e)[6] == "0")
    means = np.stack([stats[e][0] for e in encs]).astype(np.float32)
    if clf.layout_name == "seven_bit":
        means = means[:, 32:95]
        want = [convert_code_to_7b(TEN_BIT.code_str(e)) for e in encs]
    else:
        want = [TEN_BIT.code_str(e) for e in encs]
    means = means / np.maximum(means.max(axis=1, keepdims=True), 1e-12)
    codes, _, _, _ = clf.classify(jnp.asarray(means))
    return np.mean([c == w for c, w in zip(codes, want)])


def test_registry_covers_every_reference_builder():
    import re

    src = open(os.path.join(os.path.dirname(mtrain.__file__), "..", "..",
                            "PARITY.md")).read() if False else None
    ref = "/root/reference/hiprfish-image-analysis-reference-training/" \
          "hiprfish_imaging_train_reference.py"
    if not os.path.exists(ref):
        pytest.skip("reference tree not present")
    names = set(re.findall(r"^def (load_training_data\w*)\(",
                           open(ref).read(), re.M))
    assert names == set(mtrain.REFERENCE_BUILDERS)


@pytest.mark.parametrize("builder,kwargs", [
    ("train_simulate", {}),
    ("train_simulate_normalized_custom_kernel", {}),
    ("train_simulate_normalized_differentiated", {}),
    ("train_excitation_adjusted_differentiated", {}),
    ("train_excitation_adjusted_noise_free", {}),
])
def test_tenbit_variant_builders_recover_their_codes(ref_folder, builder,
                                                     kwargs):
    clf = getattr(mtrain, builder)(ref_folder, 40, CFG, save=False, **kwargs)
    assert len(clf.codebook) == len(CODES)
    assert _self_accuracy(clf, ref_folder) == 1.0


def test_biofilm_select_builder(ref_folder):
    taxa = pd.DataFrame({
        "code": [convert_code_to_7b(TEN_BIT.code_str(e)) for e in CODES[:4]],
        "taxon": ["a", "b", "c", "d"]})
    clf = mtrain.train_simulate_normalized_biofilm_select(
        ref_folder, 40, taxa, CFG, save=False)
    # only codes whose 10-bit embedding is in the reference set survive
    want = {TEN_BIT.code_str(int(convert_code_to_10b(c), 2))
            for c in taxa.code}
    assert set(clf.codebook) == want & {TEN_BIT.code_str(e) for e in CODES}


def test_biofilm_7b_variants(ref_folder):
    ok7 = [e for e in CODES if TEN_BIT.code_str(e)[6] == "0"
           and TEN_BIT.code_str(e)[5] == "0" and TEN_BIT.code_str(e)[1] == "0"]
    clf = mtrain.train_excitation_adjusted_scaled_biofilm_7b(
        ref_folder, 40, CFG, save=False)
    assert clf.scaler_mean is not None
    assert len(clf.codebook) == len(ok7)

    clf2 = mtrain.train_excitation_adjusted_biofilm_7b_error_threshold(
        ref_folder, 40, CFG, save=False)
    assert len(clf2.codebook) == len(ok7)

    subset = {convert_code_to_7b(TEN_BIT.code_str(e)) for e in ok7[:2]}
    taxa = pd.DataFrame({"code": sorted(subset)})
    clf3 = mtrain.train_excitation_adjusted_biofilm_7b_limited(
        ref_folder, 40, taxa, CFG, save=False)
    assert set(clf3.codebook) == subset


def test_select_excitation_adjusted_and_select(ref_folder, tmp_path):
    tab = tmp_path / "mix_3_table.csv"
    pd.DataFrame({"Barcodes": CODES[:5]}).to_csv(tab, index=False)
    clf = mtrain.train_simulate_normalized_select_excitation_adjusted(
        ref_folder, 40, str(tab), CFG, save=True)
    assert len(clf.codebook) == 5
    assert os.path.exists(os.path.join(
        ref_folder, "reference_simulate_select_mix_3_40_excitation_adjusted_"
        "normalized_umap_transform.npz"))
    clf2 = mtrain.train_simulate_select(ref_folder, 40, str(tab), CFG,
                                        save=False)
    assert len(clf2.codebook) == 5


def test_reabsorption_variants(ref_folder):
    # needs the 7 one-hot fluorophore encodings on disk
    one_hot = [512, 128, 64, 32, 4, 2, 1]
    synthetic.write_reference_folder(TEN_BIT, ref_folder, one_hot,
                                     cells_per_code=30, seed=3)
    clf = mtrain.train_reabsorption_biofilm_7b(
        ref_folder, spc=30, cfg=CFG, save=False)
    assert len(clf.codebook) == 127
    clf2 = mtrain.train_reabsorption_excitation_adjusted_biofilm_7b(
        ref_folder, spc=20, cfg=CFG, save=False)
    assert len(clf2.codebook) == 127


def test_full_derivative_classifier_roundtrip(ref_folder, tmp_path):
    """full_derivative classifiers survive the .npz artifact round-trip
    and classify through build_features (the appended-diff block)."""
    from hiprfish_tpu.models.artifacts import load_classifier, save_classifier

    clf = mtrain.train_simulate_normalized_differentiated(
        ref_folder, 40, CFG, save=False)
    p = str(tmp_path / "diff_clf.npz")
    save_classifier(p, clf)
    clf2 = load_classifier(p)
    assert clf2.full_derivative
    assert clf2.blocks == clf.blocks
    assert _self_accuracy(clf2, ref_folder) == 1.0
