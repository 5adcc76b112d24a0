"""Result collection CLI.

Flag-compatible with hiprfish_imaging_collect_measurement_results.py:110-128:
  positional data_dir, simulation_table, simulation_results; -t R|M.
"""

from __future__ import annotations

import argparse

from hiprfish_tpu.pipeline import collect


def main(argv=None):
    from hiprfish_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser("Collect HiPR-FISH measurement results")
    parser.add_argument("data_dir", type=str)
    parser.add_argument("simulation_table", type=str)
    parser.add_argument("simulation_results", type=str)
    parser.add_argument("-t", "--type", dest="type", type=str, default="R")
    args = parser.parse_args(argv)
    if args.type == "R":
        collect.collect_reference_measurement_results(
            args.data_dir, args.simulation_table, args.simulation_results)
    else:
        collect.collect_mix_measurement_results(
            args.data_dir, args.simulation_table, args.simulation_results)


if __name__ == "__main__":
    main()
