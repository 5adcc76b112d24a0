"""Stage-by-stage dump of the multispecies ORACLE on the collapsed parity
scene 4 (MISREG_MODERATE): which mask/seed stage degenerates into one
region. Replicates ref_oracle.pipelines.generate_2d_segmentation_multispecies
with per-stage counts.

Usage: JAX_PLATFORMS=cpu PARITY_SIZE=1000 PARITY_GRID=10 \
    python tools/diag_ms_stages.py [scene] [misreg_spacing]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from scipy.ndimage import binary_fill_holes  # noqa: E402

from hiprfish_tpu.config import SEVEN_BIT  # noqa: E402

import make_parity as mp  # noqa: E402
from ref_oracle import skim  # noqa: E402
from ref_oracle.lp2d import line_profile_2d_v2  # noqa: E402
from ref_oracle.pipelines import _kmeans_labels  # noqa: E402


def ncomp(mask):
    return int(np.max(skim.label(mask)))


def main():
    scene = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    msp = float(sys.argv[2]) if len(sys.argv) > 2 else 33.0
    drift = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    misreg = {
        6: mp.MISREG_MODERATE,
        4: [(0, 0), (4, -3), (-4, 3), (3, 4), (-4, -4)],
        3: [(0, 0), (3, -2), (-3, 2), (2, 3), (-3, -3)],
    }[drift]
    psf = float(os.environ.get("DIAG_PSF", "0"))
    codes = [mp.CODES_7B[j % len(mp.CODES_7B)]
             for j in range(mp.GRID * mp.GRID)]
    noise_env = os.environ.get("DIAG_NOISE")
    if noise_env is not None:
        from hiprfish_tpu.utils import synthetic
        shifts = misreg[:4] if scene == 4 else [(0, 0), (1, 2), (-1, 0),
                                                (2, -2)]
        fov = synthetic.make_fov(
            SEVEN_BIT, codes, shape=(mp.FOV_SIZE, mp.FOV_SIZE),
            seed=100 + scene, laser_shifts=shifts, cell_axes=(7.0, 12.0),
            noise=float(noise_env), spacing=msp)
    else:
        fov = mp.fov_scene(SEVEN_BIT, codes, scene,
                           [(0, 0), (1, 2), (-1, 0), (2, -2)],
                           (7.0, 12.0), 27.0, misreg=misreg,
                           misreg_spacing=msp)
    if psf:
        from scipy.ndimage import gaussian_filter
        fov["stack"] = [gaussian_filter(np.asarray(p, np.float32),
                                        sigma=(psf, psf, 0))
                        for p in fov["stack"]]
    ped = float(os.environ.get("DIAG_PEDESTAL", "0"))
    if ped:
        # Smooth illumination-mottle background pedestal (sigma ~8 px),
        # the realistic confocal background texture: LP-CV of a smooth
        # field has no salt-and-pepper speckle for the opened-fg mask to
        # percolate through.
        from scipy.ndimage import gaussian_filter
        rng = np.random.RandomState(77)
        out = []
        for p in fov["stack"]:
            m = gaussian_filter(
                rng.randn(p.shape[0], p.shape[1]).astype(np.float32), 8.0)
            m = 1.0 + m / max(float(np.abs(m).max()), 1e-9)
            out.append(p + ped * m[:, :, None])
        fov["stack"] = out
    image_stack = [np.asarray(im, np.float64) for im in fov["stack"]]
    image_sum = [np.sum(image, axis=2) for image in image_stack]
    shift_vectors = [skim.register_translation(image_sum[0], image_sum[i])
                     for i in range(1, len(image_stack))]
    shift_vectors.insert(0, np.asarray([0.0, 0.0]))
    image_registered = [np.zeros(image.shape) for image in image_stack]
    image_shape = image_stack[0].shape[0]
    for i in range(len(image_stack)):
        sr, sc = int(shift_vectors[i][0]), int(shift_vectors[i][1])
        orm, orx = max(0, sr), image_shape + min(0, sr)
        ocm, ocx = max(0, sc), image_shape + min(0, sc)
        rrm, rrx = -min(0, sr), image_shape - max(0, sr)
        rcm, rcx = -min(0, sc), image_shape - max(0, sc)
        image_registered[i][orm:orx, ocm:ocx, :] = \
            image_stack[i][rrm:rrx, rcm:rcx, :]
    image_channel = np.dstack(image_registered)
    image_registered_sum = np.sum(image_channel, axis=2)
    srs_norm = image_registered_sum / np.max(image_registered_sum)
    srs_nl = skim.denoise_nl_means(srs_norm, h=0.02)
    image_padded = np.pad(srs_nl, 5, mode="edge")
    image_lp = np.nan_to_num(
        line_profile_2d_v2(image_padded.astype(np.float64), 11, 9))
    lp_min = np.min(image_lp, axis=3)
    lp_rng = np.max(image_lp, axis=3) - lp_min
    image_lp = image_lp - lp_min[:, :, :, None]
    with np.errstate(invalid="ignore", divide="ignore"):
        lp_rel = np.nan_to_num(image_lp / lp_rng[:, :, :, None])
    lp_rnc = lp_rel[:, :, :, 5]
    lprns = np.average(lp_rnc, axis=2)
    lq = np.percentile(lp_rnc, 25, axis=2)
    uq = np.percentile(lp_rnc, 75, axis=2)
    qcv = np.zeros(uq.shape)
    qcv_pre = (uq - lq) / (uq + lq + 1e-8)
    qcv[uq > 0] = qcv_pre[uq > 0]
    image_final = lprns * (1 - qcv)

    out = {"scene": scene, "misreg_spacing": msp,
           "shifts": [list(map(float, s)) for s in shift_vectors]}
    irs = _kmeans_labels(image_final, 2).reshape(image_final.shape)
    i0 = np.average((image_final * (irs == 0))[image_final * (irs == 0) > 0])
    i1 = np.average((image_final * (irs == 1))[image_final * (irs == 1) > 0])
    mask = irs == (1 if i0 < i1 else 0)
    out["enh_fg_fraction"] = float(mask.mean())
    out["enh_fg_components"] = ncomp(mask)
    fbo = skim.binary_opening(mask)
    fbosm = skim.remove_small_objects(fbo, 10)
    out["opened_components"] = ncomp(fbosm)
    bfh = binary_fill_holes(fbosm)
    out["opened_filled_fraction"] = float(bfh.mean())
    out["opened_filled_components"] = ncomp(bfh)
    mask_bfh = binary_fill_holes(mask)
    out["fg_filled_fraction"] = float(mask_bfh.mean())
    seeds = skim.label(bfh * mask_bfh)
    out["n_seeds"] = int(seeds.max())
    bkgf = _kmeans_labels(srs_nl, 2).reshape(srs_nl.shape)
    i0 = np.average((srs_nl * (bkgf == 0))[srs_nl * (bkgf == 0) > 0])
    i1 = np.average((srs_nl * (bkgf == 1))[srs_nl * (bkgf == 1) > 0])
    bkg_mask = bkgf == (1 if i0 < i1 else 0)
    out["bkg_fg_fraction"] = float(bkg_mask.mean())
    seeds_f = seeds * bkg_mask
    out["n_seeds_bkg_filtered"] = int(len(np.unique(seeds_f)) - 1)
    seg = skim.watershed(-(image_final * bkg_mask), seeds_f,
                         mask=mask * bkg_mask)
    seg = skim.clear_border(skim.remove_small_objects(seg, 60))
    out["final_cells"] = int(len(np.unique(seg)) - 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
