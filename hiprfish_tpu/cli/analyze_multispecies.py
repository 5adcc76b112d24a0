"""Multispecies analysis CLI (hiprfish_imaging_analyze_multispecies_images.py:202-209)."""

from __future__ import annotations

import argparse
import os

from hiprfish_tpu.pipeline import summarize


def main(argv=None):
    from hiprfish_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser(
        "Summarize multispecies synthetic community measurement results")
    parser.add_argument("input_folder", type=str)
    parser.add_argument("-p", "--probe_design_filename",
                        dest="probe_design_filename", type=str, nargs="*",
                        help="Probe design filenames (one per encoding set)")
    args = parser.parse_args(argv)
    summaries = summarize.summarize_multispecies_error_rate(
        args.input_folder, args.probe_design_filename,
        output_pdf=os.path.join(args.input_folder,
                                "multispecies_error_rate.pdf"))
    # the reference's main also renders the per-taxon spectra grid
    # (analyze_multispecies_images.py:207)
    summarize.plot_representative_cell_spectra(
        args.input_folder,
        output_pdf=os.path.join(
            args.input_folder, "multispecies_representative_cell_spectra.pdf"))
    for s in summaries:
        if len(s):
            print(s.to_string(index=False))


if __name__ == "__main__":
    main()
