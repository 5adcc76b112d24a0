"""Biofilm analysis CLI.

Flag-compatible with hiprfish_imaging_biofilm_analysis.py:1419-1468:
  positional input_folder; -p probe design CSV; -r classifier path;
  -d dimension (2 or 3); -z z-slice indices; -sf subfolder toggle.
"""

from __future__ import annotations

import argparse
import glob
import os
import re

from hiprfish_tpu.cli import resolve_classifier_path
from hiprfish_tpu.io import tables
from hiprfish_tpu.models.artifacts import load_classifier
from hiprfish_tpu.pipeline import biofilm


def main(argv=None):
    from hiprfish_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser(
        "Measure environmental microbial community spectral images")
    parser.add_argument("input_folder", type=str)
    parser.add_argument("-p", "--probe_design_filename",
                        dest="probe_design_filename", type=str, default="")
    parser.add_argument("-r", "--ref_clf", dest="ref_clf", type=str, default="")
    parser.add_argument("-d", "--d", dest="d", type=int,
                        help="Dimension of images")
    parser.add_argument("-z", "--z", dest="z", nargs="*", type=int,
                        help="Indices of z slices to analyze")
    parser.add_argument("-sf", "--sf", dest="sf", type=str,
                        help="Dataset contains subfolders")
    parser.add_argument("--max_cells", type=int, default=4096)
    args = parser.parse_args(argv)

    probes = tables.read_probe_design(args.probe_design_filename)
    taxon_lookup = biofilm.make_taxon_lookup(probes)
    taxon_lookup.to_csv(
        os.path.join(args.input_folder, "taxon_color_lookup.csv"))
    clf = load_classifier(resolve_classifier_path(args.ref_clf))

    folders = (glob.glob(f"{args.input_folder}/*") if args.sf == "T"
               else [args.input_folder])
    for folder in folders:
        if args.sf == "T" and "zstack" in folder:
            continue
        filenames = glob.glob(f"{folder}/*.czi") + glob.glob(f"{folder}/*.npy")
        samples = sorted(set(
            re.sub(r"_[0-9][0-9][0-9]?\.(czi|npy)$", "", f)
            for f in filenames
            if re.search(r"_[0-9][0-9][0-9]?\.(czi|npy)$", f)
        ))
        for s in samples:
            if args.d == 2:
                biofilm.measure_biofilm_images_2d(
                    s, clf, taxon_lookup, max_cells=args.max_cells)
            elif args.z is not None:
                from hiprfish_tpu.pipeline import segment3d

                segment3d.measure_biofilm_images_2d_from_zstack_cli(
                    s, clf, taxon_lookup, args.z, max_cells=args.max_cells)
            else:
                from hiprfish_tpu.pipeline import segment3d

                segment3d.measure_biofilm_images_3d(
                    s, clf, taxon_lookup, max_cells=args.max_cells)


if __name__ == "__main__":
    main()
