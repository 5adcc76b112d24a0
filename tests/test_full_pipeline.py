"""Full-pipeline integration test: synthetic CZI-substitute images ->
measure CLI -> train -> classify CLI -> collect -> known-barcode error rates
(the reference's ground-truth validation strategy, SURVEY.md §4)."""

import os

import numpy as np
import pandas as pd
import pytest

from hiprfish_tpu.config import TEN_BIT, ClassifierConfig
from hiprfish_tpu.models import train as mtrain
from hiprfish_tpu.pipeline import collect
from hiprfish_tpu.utils import synthetic

CODES = [5, 37, 515, 96, 640, 17, 260, 770, 1023]


@pytest.mark.slow
def test_ecoli_reference_pipeline_end_to_end(tmp_path, monkeypatch):
    data_dir = tmp_path / "data"
    ref_folder = data_dir / "hiprfish_1023_reference_08_18_2018"
    ref_folder.mkdir(parents=True)

    # 1) Synthetic measured reference spectra + classifier training.
    synthetic.write_reference_folder(TEN_BIT, str(ref_folder), CODES,
                                     cells_per_code=40, seed=0)
    cfg = ClassifierConfig(simulations_per_code=150, check_train_steps=300)
    clf = mtrain.train_excitation_adjusted_violet_derivative(
        str(ref_folder), 150, cfg, save=True)
    clf_path = os.path.join(
        str(ref_folder),
        "reference_simulate_150_excitation_adjusted_normalized_"
        "violet_derivative_umap_transform.npz")
    assert os.path.exists(clf_path)

    # 2) One synthetic FOV per barcode, written as per-laser .npy planes.
    rows = []
    for enc in CODES[:3]:  # keep runtime bounded: 3 reference samples
        folder = data_dir / "08_18_2018_1023_reference"
        folder.mkdir(exist_ok=True)
        image_name = f"08_18_2018_enc_{enc}"
        fov = synthetic.make_fov(
            TEN_BIT, [enc] * 6, shape=(192, 192), seed=enc,
            laser_shifts=[(0, 0), (1, -1), (0, 1), (-1, 0), (1, 1)],
            cell_axes=(9.0, 14.0))
        for laser, plane in zip(TEN_BIT.lasers, fov["stack"]):
            np.save(folder / f"{image_name}_{laser}.npy", plane)
        rows.append({"SAMPLE": "08_18_2018_1023_reference",
                     "IMAGES": image_name, "CALIBRATION": "F",
                     "CALIBRATION_FILENAME": "none",
                     "REFERENCE_FOLDER": ref_folder.name})
    table_path = tmp_path / "images_table.csv"
    pd.DataFrame(rows).to_csv(table_path, index=False)

    # 3) Measure + classify through the CLI entry points.
    from hiprfish_tpu.cli import classify as cli_classify
    from hiprfish_tpu.cli import measure as cli_measure

    monkeypatch.chdir(data_dir / "08_18_2018_1023_reference")
    for r in rows:
        image_files = [f"{r['IMAGES']}_{laser}.npy" for laser in TEN_BIT.lasers]
        cli_measure.main(["-i", *image_files, "-c", "F", "--max_cells", "64"])
        assert os.path.exists(f"{r['IMAGES']}_avgint.csv")
        cli_classify.main([f"{r['IMAGES']}_avgint.csv", "-rf", clf_path])
        assert os.path.exists(f"{r['IMAGES']}_cell_ids.txt")

    # 4) Collect: per-sample error rates against the known barcode.
    monkeypatch.chdir(tmp_path)
    out_csv = tmp_path / "images_table_results.csv"
    res = collect.collect_reference_measurement_results(
        str(data_dir), str(table_path), str(out_csv))
    assert os.path.exists(out_csv)
    assert (res.NCells.values >= 5).all()
    # Known-barcode accuracy: every FOV classifies with <= 1 wrong cell.
    assert (res.ErrorRate.values <= 1 / 5 + 1e-9).all()
    # At least one sample should hit zero errors -> upper-limit convention.
    assert set(res.ErrorRateUpperLimit) <= {"T", "F"}
    assert {"OneBitError", "TwoBitError", "MultipleBitError"} <= set(res.columns)


def test_collect_mix_abundance(tmp_path):
    # Synthesize cell_ids files directly and check the abundance table schema.
    data_dir = tmp_path / "data"
    folder = data_dir / "mixrun"
    folder.mkdir(parents=True)
    rows = []
    rng = np.random.RandomState(0)
    for fov in (1, 2):
        image_name = f"mix_0_fov_{fov}"
        codes = rng.choice([5, 37, 515], size=30)
        with open(folder / f"{image_name}_cell_ids.txt", "w") as f:
            for c in codes:
                f.write(TEN_BIT.code_str(int(c)) + "\n")
        np.savetxt(folder / f"{image_name}_avgint.csv",
                   rng.rand(30, 95), delimiter=",")
        rows.append({"SAMPLE": "mixrun", "IMAGES": image_name,
                     "CALIBRATION": "F", "CALIBRATION_FILENAME": "x",
                     "REFERENCE_FOLDER": "r"})
    table = tmp_path / "images_table_mix_0.csv"
    pd.DataFrame(rows).to_csv(table, index=False)
    out = tmp_path / "images_table_mix_0_results.csv"
    collect.collect_mix_measurement_results(str(data_dir), str(table), str(out))
    ab = pd.read_csv(tmp_path / "images_table_mix_0_results_abundance.csv")
    assert ab.shape[0] == 1023
    assert {"FOV1", "FOV2"} <= set(ab.columns)
    assert ab[ab.Barcodes == 5].FOV1.values[0] + ab[ab.Barcodes == 5].FOV2.values[0] > 0
    total = ab[["FOV1", "FOV2"]].values.sum()
    assert total == 60
