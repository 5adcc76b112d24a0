"""Diagnostic: how do the 3D KMeans thresholds move when fitted only on
positive voxels (the reference's 3D semantics,
hiprfish_imaging_biofilm_analysis.py:1129-1141 fits image_final[image_final
> 0] / image_norm[image_norm > 0]) vs our current whole-volume fit — and
what does that do to cells_found?

Half-scale fixture (1010 x 1010 x 170) so the sweep finishes fast.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "HIPRFISH_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"))

import numpy as np

from hiprfish_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp

from hiprfish_tpu.config import SegmentationConfig
from hiprfish_tpu.ops import kmeans as km
from hiprfish_tpu.pipeline import segment3d
from hiprfish_tpu.utils import synthetic3d as s3

shape = (1010, 1010, 170)
spec = s3.VolumeSpec(shape=shape, seed=5, spacing=(36, 36, min(52, shape[2])))
print(f"# volume {shape}, grid {spec.grid} = {spec.n_cells} cells",
      file=sys.stderr)
vol = s3.build_sum_volume(spec, 127, np.ones(127, np.float32) * 40.0, seed=1,
                          z_chunk=16)
vol_norm = vol / jnp.maximum(jnp.max(vol), 1e-12)

cfg = SegmentationConfig()

# --- bkg threshold: log10(norm + 1e-8), k=2 ---
logv = jnp.log10(vol_norm + 1e-8)
c_all = km.kmeans1d_centers(logv, 2, cfg.kmeans_iters)
thr_all = float((c_all[-1] + c_all[-2]) / 2.0)
# masked fit on host for ground truth of what the reference computes
lv = np.asarray(logv).reshape(-1)
pos = np.asarray(vol_norm).reshape(-1) > 0
print(f"# positive fraction (vol_norm > 0): {pos.mean():.4f}",
      file=sys.stderr)
c_mask = km.kmeans1d_centers(jnp.asarray(lv[pos]), 2, cfg.kmeans_iters)
thr_mask = float((c_mask[-1] + c_mask[-2]) / 2.0)
print(f"# thr_bkg unmasked={thr_all:.4f} masked={thr_mask:.4f}",
      file=sys.stderr)

# --- enhanced thresholds ---
enhanced = segment3d.lp_cv_enhance_3d_chunked(vol_norm, cfg, 128)
enh = enhanced.astype(jnp.float32)
e = np.asarray(enh).reshape(-1)
epos = e > 0
print(f"# enhanced positive fraction: {epos.mean():.4f}", file=sys.stderr)
for k in (2, 3):
    ca = km.kmeans1d_centers(enh, k, cfg.kmeans_iters)
    ta = float((ca[-1] + ca[-2]) / 2.0)
    cm = km.kmeans1d_centers(jnp.asarray(e[epos]), k, cfg.kmeans_iters)
    tm = float((cm[-1] + cm[-2]) / 2.0)
    frac_a = float((e >= ta).mean())
    frac_m = float((e >= tm).mean())
    print(f"# k={k}: thr unmasked={ta:.5f} (pass {frac_a:.4f}) "
          f"masked={tm:.5f} (pass {frac_m:.4f})", file=sys.stderr)

# --- cells found with each threshold set ---
t0 = time.time()
seg, n_cells, _ = segment3d.segment_3d_tiled([vol_norm * 1.0], cfg,
                                             max_cells=8192)
print(f"# current pipeline: {int(n_cells)} cells (true {spec.n_cells}) "
      f"in {time.time()-t0:.1f}s", file=sys.stderr)

# --- same sweep with the bench's heterogeneous per-code brightness ---
from hiprfish_tpu.config import SEVEN_BIT
from hiprfish_tpu.utils import synthetic

layout = SEVEN_BIT
codes = list(range(1, 128))
lut = np.stack([synthetic.barcode_spectrum(layout, c) for c in codes])
sums = lut.sum(axis=1)
print(f"# bench LUT brightness spread: min={sums.min():.1f} "
      f"max={sums.max():.1f} ratio={sums.max()/sums.min():.2f}",
      file=sys.stderr)
vol2 = s3.build_sum_volume(spec, len(codes), sums, seed=1, z_chunk=16)
vol2_norm = vol2 / jnp.maximum(jnp.max(vol2), 1e-12)
t0 = time.time()
seg2, n2, _ = segment3d.segment_3d_tiled([vol2_norm * 1.0], cfg,
                                         max_cells=8192)
print(f"# bench-LUT pipeline: {int(n2)} cells (true {spec.n_cells}) "
      f"in {time.time()-t0:.1f}s", file=sys.stderr)
