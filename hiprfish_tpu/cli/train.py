"""Classifier training CLI.

The reference's trainer (hiprfish_imaging_train_reference.py:2253-2255)
hardcodes its variant and paths in main(); here every builder variant is
selectable:

  python -m hiprfish_tpu.cli.train <reference_folder> \
      -v fret_biofilm_7b -s 2000 [-p probe_design.csv] [-t mix_table.csv]
"""

from __future__ import annotations

import argparse

from hiprfish_tpu.models import train as mtrain

VARIANTS = {
    "normalized": lambda a: mtrain.train_simulate_normalized(
        a.reference_folder, a.spc, seed=a.seed),
    "normalized_umap": lambda a: mtrain.train_simulate_normalized_umap_transformed(
        a.reference_folder, a.spc, seed=a.seed),
    "excitation_adjusted": lambda a: mtrain.train_excitation_adjusted(
        a.reference_folder, a.spc, seed=a.seed),
    "violet_derivative": lambda a: mtrain.train_excitation_adjusted_violet_derivative(
        a.reference_folder, a.spc, seed=a.seed),
    "biofilm_7b": lambda a: mtrain.train_excitation_adjusted_biofilm_7b(
        a.reference_folder, a.spc, seed=a.seed),
    "fret_biofilm_7b": lambda a: mtrain.train_fret_biofilm_7b(
        a.reference_folder, spc=a.spc, seed=a.seed,
        probe_design_filename=a.probe_design or None),
    "select": lambda a: mtrain.train_simulate_normalized_select(
        a.reference_folder, a.spc, a.input_tab, seed=a.seed),
    "direct": lambda a: mtrain.train_direct(a.reference_folder, seed=a.seed),
}


def main(argv=None):
    from hiprfish_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser("Train HiPR-FISH spectral classifiers")
    parser.add_argument("reference_folder", type=str)
    parser.add_argument("-v", "--variant", default="violet_derivative",
                        choices=sorted(VARIANTS))
    parser.add_argument("-s", "--spc", type=int, default=2000,
                        help="simulations per code")
    parser.add_argument("-p", "--probe_design", type=str, default="")
    parser.add_argument("-t", "--input_tab", type=str, default="")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)
    clf = VARIANTS[args.variant](args)
    print(f"trained {args.variant}: {len(clf.codebook)} codes, "
          f"{clf.train_features.shape[0]} reference rows")


if __name__ == "__main__":
    main()
