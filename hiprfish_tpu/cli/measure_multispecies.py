"""Synthetic-community (multispecies) spectral image measurement CLI.

Flag-compatible with
hiprfish_imaging_multispecies_spectral_image_measurement.py:176-184:
  -i per-laser image filenames, -c calibration image filename.
Writes {sample}_seg.npy, _registered.npy, _avgint_norm.csv (with pandas
header), _seg.png, _sum.png, _enhanced.png.
"""

from __future__ import annotations

import argparse

import numpy as np

from hiprfish_tpu.config import SegmentationConfig
from hiprfish_tpu.io import images as iio
from hiprfish_tpu.io import outputs, tables
from hiprfish_tpu.pipeline import measure, segment2d


def measure_biofilm_images_no_reference(image_names, calibration="",
                                        cfg=SegmentationConfig(),
                                        max_cells=4096):
    sample = tables.sample_from_image_name(image_names[0])
    stack = iio.load_image_stack(image_names)
    cal = iio.load_calibration_image(calibration) if calibration else None
    res = segment2d.segment_lpcv(stack, cal, cfg, max_cells, "multispecies")
    n = int(res.n_cells)
    avgint, avgint_norm = measure.measure_fov(
        res.segmentation, res.registered, n, max_cells)
    seg = np.asarray(res.segmentation)
    np.save(f"{sample}_seg.npy", seg)
    np.save(f"{sample}_registered.npy", np.asarray(res.registered))
    outputs.save_avgint_norm_csv_with_header(
        f"{sample}_avgint_norm.csv", avgint_norm)
    outputs.save_segmentation(seg, sample)
    outputs.save_sum_png(np.asarray(res.fov_sum), sample)
    outputs.save_sum_png(np.asarray(res.enhanced), sample, "_enhanced.png")
    return res


def main(argv=None):
    from hiprfish_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser(
        "Measure multispecies synthetic spectral images")
    parser.add_argument("-i", "--image_name", dest="image_name", nargs="*",
                        default=[], type=str)
    parser.add_argument("-c", "--calibration", dest="calibration", type=str,
                        default="")
    parser.add_argument("--max_cells", type=int, default=4096)
    args = parser.parse_args(argv)
    measure_biofilm_images_no_reference(
        args.image_name, args.calibration, max_cells=args.max_cells)


if __name__ == "__main__":
    main()
