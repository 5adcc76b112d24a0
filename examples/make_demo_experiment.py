"""Synthesize a complete demo experiment: reference spectra folder, CZI
FOVs for three barcodes, the experiment table, and the workflow config."""

import json
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hiprfish_tpu.config import TEN_BIT
from hiprfish_tpu.io import czi
from hiprfish_tpu.utils import synthetic


def main(out_dir="demo_data", codes=(5, 37, 515), fov_shape=(256, 256)):
    ref = os.path.join(out_dir, "ref")
    run = os.path.join(out_dir, "run")
    os.makedirs(ref, exist_ok=True)
    os.makedirs(run, exist_ok=True)
    synthetic.write_reference_folder(TEN_BIT, ref, list(codes),
                                     cells_per_code=40, seed=0)
    rows = []
    for enc in codes:
        name = f"demo_enc_{enc}"
        fov = synthetic.make_fov(
            TEN_BIT, [enc] * 8, shape=fov_shape, seed=enc,
            laser_shifts=[(0, 0), (1, -1), (0, 1), (-1, 0), (1, 1)],
            cell_axes=(9.0, 14.0))
        for laser, plane in zip(TEN_BIT.lasers, fov["stack"]):
            czi.write_czi(os.path.join(run, f"{name}_{laser}.czi"), plane)
        rows.append({"SAMPLE": "run", "IMAGES": name, "CALIBRATION": "F",
                     "CALIBRATION_FILENAME": "none",
                     "REFERENCE_FOLDER": "ref", "SPC": 200})
    table = os.path.join(out_dir, "images_table.csv")
    pd.DataFrame(rows).to_csv(table, index=False)
    cfg = {
        "__default__": {"SCRIPTS_PATH": "", "DATA_DIR": out_dir},
        "images": {"image_list_table": table, "image_type": "R"},
    }
    with open(os.path.join(out_dir, "hiprfish_config_imaging.json"), "w") as f:
        json.dump(cfg, f, indent=2)
    print(f"demo experiment written to {out_dir}/")


if __name__ == "__main__":
    main(*sys.argv[1:2])
