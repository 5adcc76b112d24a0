"""Batch production runner: prefetch -> sharded fused pipeline -> artifacts."""

import numpy as np
import pytest
import jax

from hiprfish_tpu.config import SEVEN_BIT, SegmentationConfig
from hiprfish_tpu.parallel import fov_batch, mesh as meshlib
from hiprfish_tpu.utils import synthetic
from hiprfish_tpu.io import czi


@pytest.mark.slow
def test_run_batch_pipeline(tmp_path):
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    import __graft_entry__ as g

    _, _, _ = g._tiny_classifier_and_fov()  # warm helper reuse
    # Build a real classifier for 4 codes.
    from hiprfish_tpu.config import ClassifierConfig
    from hiprfish_tpu.models import train as mtrain
    from hiprfish_tpu.models.classifier import train_classifier

    codes = [1, 9, 65, 127]
    rng = np.random.RandomState(0)
    lut = synthetic.fluorophore_spectra(SEVEN_BIT)
    rows, cs = [], []
    for c in codes:
        spec = synthetic.barcode_spectrum(SEVEN_BIT, c, lut)
        r = rng.uniform(0.7, 1.3, (40, 1)) * spec[None, :] \
            + rng.randn(40, 63) * 0.02
        rows.append(np.clip(r, 0, None))
        cs += [SEVEN_BIT.code_str(c)] * 40
    sp = np.concatenate(rows).astype(np.float32)
    sp /= np.maximum(sp.max(1, keepdims=True), 1e-12)
    clf = train_classifier(
        jax.random.PRNGKey(0), SEVEN_BIT, sp, cs,
        mtrain.check_bits_for_codes(SEVEN_BIT, cs),
        ClassifierConfig(check_train_steps=150))

    # 3 FOVs (odd count exercises batch padding) written as zstd CZIs.
    samples = []
    for i in range(3):
        fov = synthetic.make_fov(SEVEN_BIT, codes, shape=(96, 96), seed=i,
                                 cell_axes=(6.0, 9.0))
        files = []
        for laser, plane in zip(SEVEN_BIT.lasers, fov["stack"]):
            p = str(tmp_path / f"s{i}_{laser}.czi")
            czi.write_czi(p, plane, compression=czi.COMP_ZSTD0)
            files.append(p)
        samples.append((f"s{i}", files))

    mesh = meshlib.make_mesh(4, fov=2, tile=2)
    cfg = SegmentationConfig(watershed_max_iters=64, ccl_max_iters=64,
                             kmeans_iters=10, lp_cell_min_size=20)
    res = fov_batch.run_batch_pipeline(
        samples, clf, cfg, max_cells=32, batch=2, mesh=mesh,
        denoise=False, out_dir=str(tmp_path))
    assert set(res) == {"s0", "s1", "s2"}
    import os

    for name, (n, barcode_calls) in res.items():
        assert n >= 3, name
        assert os.path.exists(tmp_path / f"{name}_avgint.csv")
        assert os.path.exists(tmp_path / f"{name}_cell_ids.txt")
        want = {SEVEN_BIT.code_str(c) for c in codes}
        assert set(barcode_calls) <= want | {c + "_error" for c in want}


def test_czi_zstd_roundtrip(tmp_path, rng):
    plane = rng.rand(32, 40, 3).astype(np.float32)
    p = str(tmp_path / "z.czi")
    czi.write_czi(p, plane, compression=czi.COMP_ZSTD0)
    got = czi.CziFile(p).load_plane()
    np.testing.assert_allclose(got, plane, rtol=1e-6)
    # zstd file should be smaller than raw on compressible data
    czi.write_czi(str(tmp_path / "u.czi"), plane)
    import os

    assert os.path.getsize(p) < os.path.getsize(tmp_path / "u.czi") * 1.1
