"""Workflow driver CLI — the `snakemake --configfile ...` replacement.

  python -m hiprfish_tpu.cli.workflow hiprfish_config_imaging.json \
      [--family ecoli|multispecies]
"""

from __future__ import annotations

import argparse

from hiprfish_tpu.workflows import driver


def main(argv=None):
    from hiprfish_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser("Run a HiPR-FISH imaging workflow")
    parser.add_argument("configfile", type=str,
                        help="hiprfish_config_imaging.json")
    parser.add_argument("--family", choices=["ecoli", "multispecies"],
                        default="ecoli")
    parser.add_argument("--max_cells", type=int, default=4096)
    args = parser.parse_args(argv)
    if args.family == "ecoli":
        out = driver.run_ecoli_workflow(args.configfile,
                                        max_cells=args.max_cells)
        print(f"results: {out}")
    else:
        driver.run_multispecies_workflow(args.configfile,
                                         max_cells=args.max_cells)


if __name__ == "__main__":
    main()
