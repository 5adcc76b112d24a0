"""Generate PARITY_r0N.json: the reference-parity evidence file.

Runs the reference oracle (tests/ref_oracle) and the TPU pipelines on a
sweep of shared synthetic FOVs — 5 per pipeline family — and records
segmentation parity (cell counts, IoU, per-cell spectrum agreement) and
classification parity (same-spectra and end-to-end barcode agreement vs the
0.5% BASELINE.md budget, plus each side's accuracy against planted truth).

Usage: JAX_PLATFORMS=cpu python tools/make_parity.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

from hiprfish_tpu.config import SEVEN_BIT, TEN_BIT, SEVEN_BIT_SUBSET  # noqa: E402
from hiprfish_tpu.models import train as mtrain  # noqa: E402
from hiprfish_tpu.utils import synthetic  # noqa: E402

from ref_oracle import classify as rc  # noqa: E402
from ref_oracle import harness  # noqa: E402

CODES_7B = [1, 9, 65, 127, 34, 88, 5, 96, 18, 73, 22, 41, 100, 55, 3, 77]
CODES_10B = [5, 37, 515, 1023, 96, 640, 17, 260, 770, 129, 33, 514, 68,
             272, 9, 48]
N_FOVS = 5


def embed_10b(enc7: int) -> int:
    s7 = format(enc7, "07b")
    s10 = ["0"] * 10
    for i, p in enumerate(SEVEN_BIT_SUBSET):
        s10[p] = s7[i]
    return int("".join(s10), 2)


def agg(dicts, key):
    vals = [d[key] for d in dicts]
    return {"mean": float(np.mean(vals)), "min": float(np.min(vals)),
            "max": float(np.max(vals))}


def run_family(name, layout, codes, shifts, cell_axes, ref_clf, tpu_clf,
               barcodes_arg):
    seg_metrics, clf_metrics = [], []
    for i in range(N_FOVS):
        fov = synthetic.make_fov(
            layout, codes, shape=(256, 256), seed=100 + i,
            laser_shifts=shifts, cell_axes=cell_axes)
        t0 = time.time()
        m, bundle = harness.segmentation_parity(
            fov, "ecoli" if name == "ecoli" else "multispecies")
        c = harness.classification_parity(bundle, fov, barcodes_arg,
                                          ref_clf, tpu_clf)
        print(f"[{name} fov {i}] {m['matched']}/{m['n_cells_ref']} matched, "
              f"iou={m['mean_iou']:.3f}, same-spectra "
              f"agree={c['same_spectra_agreement']:.4f}, "
              f"e2e={c['e2e_agreement']:.4f} ({time.time()-t0:.0f}s)",
              file=sys.stderr)
        seg_metrics.append(m)
        clf_metrics.append(c)
    total_cells = int(sum(m["n_cells_ref"] for m in seg_metrics))
    return {
        "n_fovs": N_FOVS,
        "total_cells_ref": total_cells,
        "total_cells_tpu": int(sum(m["n_cells_tpu"] for m in seg_metrics)),
        "matched_cells": int(sum(m["matched"] for m in seg_metrics)),
        "mean_iou": agg(seg_metrics, "mean_iou"),
        "min_iou": agg(seg_metrics, "min_iou"),
        "spectrum_cos": agg(seg_metrics, "mean_spectrum_cos"),
        "same_spectra_barcode_agreement": agg(
            clf_metrics, "same_spectra_agreement"),
        "e2e_barcode_agreement": agg(clf_metrics, "e2e_agreement"),
        "ref_truth_accuracy": agg(clf_metrics, "ref_truth_accuracy"),
        "tpu_truth_accuracy": agg(clf_metrics, "tpu_truth_accuracy"),
    }


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PARITY_r02.json"
    t_start = time.time()

    tmp7 = tempfile.mkdtemp()
    encs10 = [embed_10b(e) for e in CODES_7B] + [
        embed_10b(e) for e in (2, 4, 8, 16, 32, 64, 6, 12, 24, 48, 33, 66,
                               99, 111)]
    synthetic.write_reference_folder(TEN_BIT, tmp7, encs10,
                                     cells_per_code=40, seed=7)
    ref7 = rc.train_ref_7b(tmp7, spc=60, seed=1)
    tpu7 = mtrain.train_excitation_adjusted_biofilm_7b(
        tmp7, spc=60, seed=1, save=False)

    tmp10 = tempfile.mkdtemp()
    encs_ref10 = CODES_10B + [100, 200, 300, 400, 511, 767, 895, 959, 991,
                              1007, 3, 7, 15, 31]
    synthetic.write_reference_folder(TEN_BIT, tmp10, encs_ref10,
                                     cells_per_code=40, seed=7)
    ref10 = rc.train_ref_10b(tmp10, spc=60, seed=1)
    tpu10 = mtrain.train_excitation_adjusted_violet_derivative(
        tmp10, spc=60, seed=1, save=False)

    result = {
        "description": (
            "Reference-parity evidence: TPU pipelines vs a line-for-line "
            "oracle transcription of the reference (tests/ref_oracle; same "
            "sklearn KMeans/SVC calls, skimage-semantics morphology/"
            "watershed, pyx-derived stencil; UMAP+SVC stage replaced by "
            "exact kNN under the reference's own gated metric — umap-learn/"
            "skimage/numba/Cython are not installed and may not be "
            "installed here). Budget: barcode agreement >= 99.5% "
            "(BASELINE.md)."),
        "multispecies_7b": run_family(
            "multispecies", SEVEN_BIT, CODES_7B,
            [(0, 0), (1, 2), (-1, 0), (2, -2)], (7.0, 12.0),
            ref7, tpu7, CODES_7B),
        "ecoli_10b": run_family(
            "ecoli", TEN_BIT, CODES_10B,
            [(0, 0), (2, -1), (0, 3), (-2, 0), (1, 1)], (9.0, 14.0),
            ref10, tpu10, CODES_10B),
        "runtime_s": None,
    }
    budget = 0.995
    result["budget"] = budget
    result["pass"] = bool(
        result["multispecies_7b"]["e2e_barcode_agreement"]["mean"] >= budget
        and result["ecoli_10b"]["e2e_barcode_agreement"]["mean"] >= budget
        and result["multispecies_7b"]["same_spectra_barcode_agreement"]
        ["mean"] >= budget
        and result["ecoli_10b"]["same_spectra_barcode_agreement"]
        ["mean"] >= budget)
    result["runtime_s"] = round(time.time() - t_start, 1)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items()
                      if k in ("pass", "runtime_s")}))
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
