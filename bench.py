"""Headline benchmark: segment + classify one 2000x2000 multi-laser spectral
FOV on one chip (BASELINE.md north star: < 1 s/chip).

Runs the fused single-program pipeline (pipeline/fused.fov_step): FFT
registration over 4 lasers -> NL-means -> fused LP-CV enhancement -> KMeans ->
CCL seeding -> watershed -> relabel -> segment_sum spectra -> check heads ->
gated-metric kNN barcode calls for up to 8192 cells against a 127-code
reference matrix.

Prints ONE JSON line: {"metric", "value" (megapixels/s/chip), "unit",
"vs_baseline" (speedup vs the 1 s target)}.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np


def main():
    import jax
    from hiprfish_tpu.config import SEVEN_BIT, ClassifierConfig, SegmentationConfig
    from hiprfish_tpu.models import train as mtrain
    from hiprfish_tpu.models.classifier import train_classifier
    from hiprfish_tpu.pipeline import fused
    from hiprfish_tpu.utils import synthetic

    size = int(os.environ.get("BENCH_SIZE", "2000"))
    n_cells = int(os.environ.get("BENCH_CELLS", "400"))
    max_cells = 8192

    layout = SEVEN_BIT
    rng = np.random.RandomState(0)
    all_codes = list(range(1, 128))
    cell_codes = [all_codes[i % 127] for i in range(n_cells)]

    t0 = time.time()
    fov = synthetic.make_fov(layout, cell_codes, shape=(size, size), seed=1,
                             laser_shifts=[(0, 0), (2, -1), (0, 3), (-2, 0)],
                             cell_axes=(7.0, 12.0))
    import jax.numpy as jnp
    # Stage the FOV on device once (production loaders stream FOVs ahead of
    # compute; the benchmark measures the on-chip pipeline).
    stack = tuple(jax.device_put(np.asarray(a, np.float32))
                  for a in fov["stack"])
    jax.block_until_ready(stack)
    print(f"# synthetic FOV {size}x{size}, {n_cells} cells, built in "
          f"{time.time()-t0:.1f}s", file=sys.stderr)

    # Train a 127-code classifier from simulated reference spectra.
    spectra_lut = synthetic.fluorophore_spectra(layout)
    rows, code_strs = [], []
    for c in all_codes:
        spec = synthetic.barcode_spectrum(layout, c, spectra_lut)
        r = rng.uniform(0.7, 1.3, (50, 1)) * spec[None, :] \
            + rng.randn(50, layout.n_channels) * 0.02
        rows.append(np.clip(r, 0, None))
        code_strs += [layout.code_str(c)] * 50
    spectra = np.concatenate(rows).astype(np.float32)
    spectra = spectra / np.maximum(spectra.max(axis=1, keepdims=True), 1e-12)
    checks = mtrain.check_bits_for_codes(layout, code_strs)
    clf = train_classifier(jax.random.PRNGKey(0), layout, spectra, code_strs,
                           checks, ClassifierConfig(check_train_steps=300))
    clf_arrays, clf_static = fused.classifier_to_device_args(clf)
    print(f"# classifier: {len(clf.codebook)} codes, "
          f"{clf.train_features.shape[0]} reference rows", file=sys.stderr)

    cfg = SegmentationConfig()
    step = lambda: fused.fov_step(stack, clf_arrays, cfg, max_cells,
                                  clf_static, True)

    t0 = time.time()
    out = step()
    out.segmentation.block_until_ready()
    compile_and_first = time.time() - t0
    print(f"# first call (compile+run): {compile_and_first:.1f}s; "
          f"cells found: {int(out.n_cells)}", file=sys.stderr)

    # Barcode accuracy vs planted ground truth (cells matched by majority
    # overlap with the truth label image).
    seg = np.asarray(out.segmentation)
    truth = fov["truth_labels"]
    codes_pred = np.asarray(out.code_idx)
    codebook = list(clf.codebook)
    n_found = int(out.n_cells)
    correct = total = 0
    for lab in range(1, min(n_found, max_cells - 1) + 1):
        overl = truth[seg == lab]
        vals, cnt = np.unique(overl[overl > 0], return_counts=True)
        if len(vals) == 0:
            continue
        gt_code = layout.code_str(cell_codes[int(vals[np.argmax(cnt)]) - 1])
        total += 1
        correct += codebook[codes_pred[lab]] == gt_code
    acc = correct / max(total, 1)
    print(f"# barcode accuracy vs ground truth: {acc:.4f} "
          f"({correct}/{total})", file=sys.stderr)

    reps = 5
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = step()
        out.segmentation.block_until_ready()
        times.append(time.time() - t0)
    t = float(np.median(times))
    mp = size * size / 1e6
    print(f"# steady-state: {t*1000:.1f} ms/FOV "
          f"(min {min(times)*1000:.1f}, max {max(times)*1000:.1f})",
          file=sys.stderr)

    print(json.dumps({
        "metric": "segment+classify throughput (2000x2000 4-laser FOV, "
                  "63ch, 127-code kNN)",
        "value": round(mp / t, 3),
        "unit": "megapixels/s/chip",
        "vs_baseline": round(1.0 / t, 3),
        "extra": {
            "ms_per_fov": round(t * 1000, 1),
            "barcode_accuracy": round(acc, 4),
            "cells": int(out.n_cells),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
