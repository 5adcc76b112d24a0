"""7-bit spectra classification CLI (synthetic community / biofilm).

Flag-compatible with hiprfish_imaging_classify_spectra.py:51-60:
  -i input normalized spectra (_avgint_norm.csv), -r classifier path.
"""

from __future__ import annotations

import argparse

from hiprfish_tpu.cli import resolve_classifier_path
from hiprfish_tpu.models.artifacts import load_classifier
from hiprfish_tpu.pipeline import classify


def main(argv=None):
    from hiprfish_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser("Classify single cell spectra")
    parser.add_argument("-i", "--input_spectra", dest="input_spectra",
                        type=str, default="")
    parser.add_argument("-r", "--ref_clf", dest="ref_clf", type=str, default="")
    args = parser.parse_args(argv)
    import os

    if args.ref_clf.endswith("transform_biofilm_7b.pkl") and os.path.exists(
            args.ref_clf):
        # the reference's own 4-pickle stack (classify_spectra.py:56-59)
        classify.classify_spectra_7b_legacy(args.input_spectra, args.ref_clf)
        return
    clf = load_classifier(resolve_classifier_path(args.ref_clf))
    classify.classify_spectra_7b(args.input_spectra, clf)


if __name__ == "__main__":
    main()
