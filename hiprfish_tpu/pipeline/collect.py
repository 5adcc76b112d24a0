"""L6: experiment-level collection of per-FOV results.

Reproduces hiprfish_imaging_collect_measurement_results.py:
  * reference mode ('R'): per-sample barcode error rate against the known
    encoding, zero-error reported as the 1/N upper limit, one/two/multi-bit
    error decomposition (:18-69);
  * mix mode ('M'): per-FOV barcode value_counts merged into the 1023-row
    abundance table (:71-102).
Output CSV schemas match byte-for-byte semantics (columns and ordering).
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd

from hiprfish_tpu.io import tables


def _read_cell_ids(path: str) -> pd.Series:
    ids = pd.read_csv(path, header=None, dtype=str)
    ids.columns = ["Barcodes"]
    return ids.Barcodes


def bit_error_counts(measured: pd.Series, expected: str):
    """(one_bit, two_bit, multi_bit) error tallies via per-position bit
    differences (collect_measurement_results.py:51-67)."""
    one = two = multi = 0
    exp_bits = np.array([int(b) for b in expected])
    for code in measured:
        bits = np.array([int(b) for b in str(code)])
        nerr = int(np.abs(bits - exp_bits).sum())
        if nerr == 0:
            continue
        if nerr == 1:
            one += 1
        elif nerr == 2:
            two += 1
        else:
            multi += 1
    return one, two, multi


def collect_reference_measurement_results(data_dir: str, simulation_table: str,
                                          output_filename: str,
                                          n_bits: int = 10) -> pd.DataFrame:
    """Known-barcode error-rate collection (reference mode)."""
    sim_tab = pd.read_csv(simulation_table)
    sim_tab["NCells"] = 0
    sim_tab["BarcodeComplexity"] = 0
    sim_tab["Barcodes"] = 0
    for i in range(sim_tab.shape[0]):
        folder = sim_tab.SAMPLE.values[i]
        image_name = sim_tab.IMAGES.values[i]
        enc = tables.parse_encoding(image_name)
        code = format(enc, f"0{n_bits}b")
        sim_tab.loc[i, "Barcodes"] = enc
        sim_tab.loc[i, "BarcodeComplexity"] = sum(int(b) for b in code)
        meas = os.path.join(data_dir, folder, image_name + "_avgint.csv")
        ids_path = os.path.join(data_dir, folder, image_name + "_cell_ids.txt")
        if os.path.exists(meas):
            sim_tab.loc[i, "NCells"] = pd.read_csv(meas, header=None).shape[0]
        if os.path.exists(ids_path):
            ids = _read_cell_ids(ids_path)
            n = ids.shape[0]
            error_rate = 1 - np.sum(ids.values == code) / n
            if error_rate == 0:
                sim_tab.loc[i, "ErrorRate"] = 1 / n
                sim_tab.loc[i, "ErrorRateUpperLimit"] = "T"
            else:
                sim_tab.loc[i, "ErrorRate"] = error_rate
                sim_tab.loc[i, "ErrorRateUpperLimit"] = "F"
            wrong = ids[ids.values != code]
            one, two, multi = bit_error_counts(wrong, code)
            sim_tab.loc[i, "OneBitError"] = one / n
            sim_tab.loc[i, "TwoBitError"] = two / n
            sim_tab.loc[i, "MultipleBitError"] = multi / n
    sim_tab.to_csv(output_filename, index=False, header=True)
    return sim_tab


def collect_mix_measurement_results(data_dir: str, simulation_table: str,
                                    output_filename: str,
                                    n_barcodes: int = 1023) -> pd.DataFrame:
    """Mix-experiment abundance collection (mix mode)."""
    sim_tab = pd.read_csv(simulation_table)
    sim_tab["NCells"] = 0
    sim_tab["FOV"] = 0
    abundance = pd.DataFrame(np.arange(1, n_barcodes + 1), columns=["Barcodes"])
    for i in range(sim_tab.shape[0]):
        folder = sim_tab.SAMPLE.values[i]
        image_name = sim_tab.IMAGES.values[i]
        sim_tab.loc[i, "FOV"] = tables.parse_fov(image_name)
        meas = os.path.join(data_dir, folder, image_name + "_avgint.csv")
        ids_path = os.path.join(data_dir, folder, image_name + "_cell_ids.txt")
        if os.path.exists(meas):
            sim_tab.loc[i, "NCells"] = pd.read_csv(meas, header=None).shape[0]
        if os.path.exists(ids_path):
            ids = _read_cell_ids(ids_path)
            counts = (
                ids.value_counts().rename_axis("code")
                .reset_index(name=f"FOV{i + 1}")
            )
            counts["Barcodes"] = [int(x, 2) for x in counts["code"]]
            abundance = abundance.merge(
                counts[["Barcodes", f"FOV{i + 1}"]], on="Barcodes", how="left"
            ).fillna(0)
    abundance_filename = re.sub(r"\.csv$", "_abundance.csv", output_filename)
    sim_tab.to_csv(output_filename, index=False, header=True)
    abundance.to_csv(abundance_filename, index=False, header=True)
    return sim_tab
