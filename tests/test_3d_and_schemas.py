"""3D labeling/watershed correctness + output schema goldens."""

import numpy as np
import pandas as pd
import scipy.ndimage as ndi
import jax.numpy as jnp

from hiprfish_tpu.ops import labeling as lab
from hiprfish_tpu.ops import watershed as ws


def test_label_3d_matches_scipy(rng):
    mask = rng.rand(24, 20, 16) > 0.7
    ours, n1 = lab.relabel_sequential(lab.label(jnp.asarray(mask), 1))
    want, n2 = ndi.label(mask)
    assert int(n1) == n2
    pairs = set(zip(np.asarray(ours)[mask].tolist(), want[mask].tolist()))
    assert len(pairs) == n2


def test_flood_reach_3d():
    mask = np.zeros((10, 10, 10), bool)
    mask[0, 0, :] = True          # border-connected run
    mask[5, 5, 5] = True          # isolated interior voxel
    seeds = lab.border_mask(mask.shape)
    reach = np.asarray(lab.flood_reach(seeds, jnp.asarray(mask), 1))
    assert reach[0, 0, 5] and not reach[5, 5, 5]


def test_watershed_3d_two_basins():
    surf = np.zeros((16, 16, 16), np.float32)
    surf[:, 8, :] = 1.0
    markers = np.zeros((16, 16, 16), np.int32)
    markers[8, 3, 8] = 1
    markers[8, 13, 8] = 2
    out = np.asarray(ws.watershed(jnp.asarray(surf), jnp.asarray(markers),
                                  None, 1, 64))
    assert (out[:, :8] == 1).all() and (out[:, 9:] == 2).all()


def test_avgint_ids_schema(tmp_path, monkeypatch, rng):
    """classify_ecoli output: 132 features + barcode + sample + label columns
    (image_classification.py:59-64 writes feature cols, code, sample, label)."""
    import jax
    from hiprfish_tpu.config import TEN_BIT, ClassifierConfig
    from hiprfish_tpu.models import train as mtrain
    from hiprfish_tpu.models.classifier import train_classifier
    from hiprfish_tpu.pipeline import classify
    from hiprfish_tpu.utils import synthetic

    codes = [5, 37]
    lut = synthetic.fluorophore_spectra(TEN_BIT)
    rows, cs = [], []
    for c in codes:
        spec = synthetic.barcode_spectrum(TEN_BIT, c, lut)
        r = rng.uniform(0.7, 1.3, (30, 1)) * spec[None, :] \
            + rng.randn(30, 95) * 0.02
        rows.append(np.clip(r, 0, None))
        cs += [TEN_BIT.code_str(c)] * 30
    sp = np.concatenate(rows).astype(np.float32)
    sp /= np.maximum(sp.max(1, keepdims=True), 1e-12)
    sp = np.asarray(
        jnp.concatenate([jnp.asarray(sp),
                         jnp.diff(jnp.asarray(sp)[:, :32], axis=1)], axis=1))
    clf = train_classifier(
        jax.random.PRNGKey(0), TEN_BIT, sp, cs,
        mtrain.check_bits_for_codes(TEN_BIT, cs),
        ClassifierConfig(check_train_steps=100), violet_derivative=True)

    monkeypatch.chdir(tmp_path)
    avgint = rng.uniform(0.7, 1.3, (5, 1)) * synthetic.barcode_spectrum(
        TEN_BIT, 5, lut)[None, :]
    np.savetxt("s_avgint.csv", avgint, delimiter=",")
    np.save("s_seg.npy", np.arange(1, 6)[:, None] * np.ones((5, 4), int))
    out_codes = classify.classify_ecoli("s_avgint.csv", clf, save_png=False)
    assert len(out_codes) == 5
    ids = pd.read_csv("s_avgint_ids.csv", header=None)
    # 132 features + barcode + sample + sequential label = 135 columns
    assert ids.shape == (5, 135)
    assert (ids.iloc[:, -1].values == np.arange(1, 6)).all()
    cell_ids = open("s_cell_ids.txt").read().split()
    assert cell_ids == out_codes
