"""E. coli spectral classification CLI (10-bit / 1023 barcodes).

Flag-compatible with hiprfish_imaging_image_classification.py:74-80:
  positional input_spectra (the _avgint.csv), -rf reference classifier path.
"""

from __future__ import annotations

import argparse

from hiprfish_tpu.cli import resolve_classifier_path
from hiprfish_tpu.models.artifacts import load_classifier
from hiprfish_tpu.pipeline import classify


def main(argv=None):
    from hiprfish_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser("Classify HiPR-FISH cell spectra")
    parser.add_argument("input_spectra", type=str,
                        help="Average single-cell spectra filename (_avgint.csv)")
    parser.add_argument("-rf", "--reference_clf", dest="ref_clf", type=str,
                        default="", help="Spectra classifier path")
    args = parser.parse_args(argv)
    print(f"Classifying sample {args.input_spectra}...")
    import os

    if args.ref_clf.endswith("transform.pkl") and os.path.exists(
            args.ref_clf):
        # the reference's own 3-pickle UMAP artifact stack
        # (image_classification.py:44-46), scored on device
        classify.classify_ecoli_legacy(args.input_spectra, args.ref_clf)
        return
    clf = load_classifier(resolve_classifier_path(args.ref_clf))
    classify.classify_ecoli(args.input_spectra, clf)


if __name__ == "__main__":
    main()
