"""Diagnose the collapsed multispecies parity FOV (VERDICT r04 weak #2):
PARITY_r04 shows exactly one multispecies scene contributing ~0 oracle cells
(total_cells_ref 4405 over 11 FOVs of 441). Candidates: scene 3 (high
noise, 5x) or scene 4 (MISREG_MODERATE). Runs the oracle's multispecies
segmentation on each suspect scene at full 2000^2 scale and reports the
oracle cell count + the KMeans foreground fraction (the r03 collapse
mechanism was a KMeans(2) cluster flip solidified by fill_holes).

Usage: JAX_PLATFORMS=cpu python tools/diag_parity_ms_scene.py [scene ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from hiprfish_tpu.config import SEVEN_BIT  # noqa: E402

import make_parity as mp  # noqa: E402
from ref_oracle import pipelines as rp  # noqa: E402


def diag_scene(i: int):
    codes = [mp.CODES_7B[j % len(mp.CODES_7B)]
             for j in range(mp.GRID * mp.GRID)]
    fov = mp.fov_scene(SEVEN_BIT, codes, i, [(0, 0), (1, 2), (-1, 0), (2, -2)],
                       (7.0, 12.0), 27.0, misreg=mp.MISREG_MODERATE,
                       misreg_pedestal=0.04)
    t0 = time.time()
    # The oracle's registration shifts vs the planted ones: a wrong lag
    # (e.g. the colony's near-neighbor pitch) leaves the planes misaligned
    # and smears every cell into one fg cluster.
    from ref_oracle import skim

    image_sum = [np.sum(np.asarray(im, np.float64), axis=2)
                 for im in fov["stack"]]
    found = [list(map(float, skim.register_translation(image_sum[0],
                                                       image_sum[k])))
             for k in range(1, len(image_sum))]
    _, _, enhanced, seg = rp.generate_2d_segmentation_multispecies(
        fov["stack"])
    ids = np.unique(seg)
    n = int((ids > 0).sum())
    areas = np.bincount(seg.ravel())[1:]
    return {
        "scene": i,
        "misreg_pedestal": 0.04,
        "planted_shifts": (mp.MISREG_MODERATE[1:4] if i == 4
                           else [(1, 2), (-1, 0), (2, -2)]),
        "oracle_found_shifts": found,
        "oracle_cells": n,
        "oracle_fg_fraction": float((seg > 0).mean()),
        "largest_region_px": int(areas.max()) if len(areas) else 0,
        "median_region_px": float(np.median(areas[areas > 0]))
        if n else 0.0,
        "runtime_s": round(time.time() - t0, 1),
    }


if __name__ == "__main__":
    scenes = [int(a) for a in sys.argv[1:]] or [3, 4]
    for s in scenes:
        print(json.dumps(diag_scene(s)), flush=True)
