"""Mix-experiment summary CLI (hiprfish_summarize_mix_experiment.py)."""

from __future__ import annotations

import argparse
import re

from hiprfish_tpu.pipeline import summarize


def main(argv=None):
    from hiprfish_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser("Summarize HiPR-FISH mix experiments")
    parser.add_argument("abundance_csv", type=str,
                        help="*_results_abundance.csv from cli.collect")
    parser.add_argument("-n", "--n_barcodes", type=int, default=1023)
    args = parser.parse_args(argv)
    base = re.sub(r"\.csv$", "", args.abundance_csv)
    summarize.plot_mean_abundance_barcodes(
        args.abundance_csv, base + "_barcodes.pdf", args.n_barcodes)
    summarize.plot_mean_abundance_distribution(
        args.abundance_csv, base + "_distribution.pdf", args.n_barcodes)


if __name__ == "__main__":
    main()
