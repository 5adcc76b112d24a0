"""Transcriptions of the reference's 2D segmentation + measurement engines.

These follow the reference sources statement by statement (citations on each
function) using the sklearn the reference itself uses and the skimage
equivalents in ``skim``. They accept in-memory numpy stacks (the reference's
only unreproducible dependency, bioformats/JVM image loading, is bypassed —
the arrays fed here are exactly what bioformats.load_image would return).
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import binary_fill_holes
from sklearn.cluster import KMeans

from . import skim
from .lp2d import line_profile_2d_v2


def _kmeans_labels(values: np.ndarray, k: int) -> np.ndarray:
    """KMeans(n_clusters=k, random_state=0).fit_predict on a column vector —
    the exact call the reference makes (spectral_image_measurement.py:73,85;
    multispecies...py:125,141). n_init=10 pins the historical sklearn
    default the reference ran under."""
    km = KMeans(n_clusters=k, random_state=0, n_init=10)
    return km.fit_predict(values.reshape(-1, 1))


def segment_images_ecoli(image_stack):
    """hiprfish-image-analysis-ecoli/hiprfish_imaging_spectral_image_
    measurement.py:44-127, line for line."""
    image_stack = [np.asarray(im, np.float64) for im in image_stack]
    image_channel_max = [np.max(image, axis=2) for image in image_stack]
    shift_vectors = [
        skim.register_translation(image_channel_max[0], image_channel_max[i])
        for i in range(1, len(image_stack))
    ]
    shift_vectors.insert(0, np.asarray([0.0, 0.0]))
    image_registered = [np.zeros(image.shape) for image in image_stack]
    shift_filter_mask = [
        np.full((image.shape[0], image.shape[1]), False, dtype=bool)
        for image in image_stack
    ]
    image_shape = image_stack[0].shape[0]
    for i in range(len(image_stack)):
        shift_row = int(shift_vectors[i][0])
        shift_col = int(shift_vectors[i][1])
        if np.abs(shift_row) > 15:
            shift_row = 0
        if np.abs(shift_col) > 15:
            shift_col = 0
        orm = int(np.maximum(0, shift_row))
        orx = int(image_shape + np.minimum(0, shift_row))
        ocm = int(np.maximum(0, shift_col))
        ocx = int(image_shape + np.minimum(0, shift_col))
        rrm = int(-np.minimum(0, shift_row))
        rrx = int(image_shape - np.maximum(0, shift_row))
        rcm = int(-np.minimum(0, shift_col))
        rcx = int(image_shape - np.maximum(0, shift_col))
        image_registered[i][orm:orx, ocm:ocx, :] = \
            image_stack[i][rrm:rrx, rcm:rcx, :]
        shift_filter_mask[i][orm:orx, ocm:ocx] = True
    shift_filter_mask_final = np.prod(shift_filter_mask, axis=0)
    image_registered = np.dstack(image_registered) * \
        shift_filter_mask_final[:, :, None]
    image_cn = np.log(np.sum(image_registered, axis=2) + 1e-2)

    rough = _kmeans_labels(image_cn, 2)
    rough_seg = rough.reshape(image_cn.shape)
    i0 = np.average(image_cn[rough_seg == 0])
    i1 = np.average(image_cn[rough_seg == 1])
    if i0 < i1:
        rough_seg_mask = rough_seg == 1
    else:
        rough_seg_mask = rough_seg == 0

    layers = _kmeans_labels(image_cn, 3)
    cell_interior = layers.reshape(image_cn.shape)
    layerint = [np.average(image_cn[cell_interior == k]) for k in range(3)]
    index = np.argsort(layerint)[2]

    cell_interior_opening = skim.binary_opening(
        skim.remove_small_holes(cell_interior == index))
    cell_sm = skim.remove_small_objects(cell_interior_opening, 50)
    dist_lab = skim.label(cell_sm)
    markers = skim.regionprops(dist_lab)
    dist_be = np.zeros(dist_lab.shape)
    while len(markers) > 0:
        for m in markers:
            if m.area < 600:
                dist_be[dist_lab == m.label] = 1
                dist_lab[dist_lab == m.label] = 0
        dist_bin_temp = skim.binary_erosion(dist_lab)
        dist_bin_temp_sm = skim.remove_small_objects(dist_bin_temp, 10)
        dist_lab = skim.label(dist_bin_temp_sm)
        markers = skim.regionprops(dist_lab)
    dist_final = skim.label(
        skim.remove_small_objects(skim.label(dist_be.astype(int)), 10))
    watershed_seeds = skim.label(dist_final)
    segmentation = skim.watershed(-image_cn, watershed_seeds,
                                  mask=rough_seg_mask)
    segmentation_sm = skim.remove_small_objects(segmentation, 100)
    segmentation_smbc = skim.clear_border(segmentation_sm)
    cells = skim.regionprops(segmentation_smbc)
    segmentation_final = np.zeros(segmentation_smbc.shape).astype(int)
    for cell in cells:
        cell_seg_image = segmentation_smbc == cell.label
        cell_seg_image_be = skim.binary_erosion(
            skim.binary_erosion(cell_seg_image))
        if cell.minor_axis_length < 15 or cell.minor_axis_length > 35:
            segmentation_final[cell_seg_image] = 0
        else:
            segmentation_final[cell_seg_image_be] = cell.label
    return segmentation_final, image_registered


def generate_2d_segmentation_multispecies(image_stack, calibration=None):
    """hiprfish-image-analysis-synthetic-community/hiprfish_imaging_
    multispecies_spectral_image_measurement.py:78-159, line for line
    (bioformats load + calibration file read replaced by the array
    arguments)."""
    image_stack = [np.asarray(im, np.float64) for im in image_stack]
    image_sum = [np.sum(image, axis=2) for image in image_stack]
    shift_vectors = [
        skim.register_translation(image_sum[0], image_sum[i])
        for i in range(1, len(image_stack))
    ]
    shift_vectors.insert(0, np.asarray([0.0, 0.0]))
    image_registered = [np.zeros(image.shape) for image in image_stack]
    image_shape = image_stack[0].shape[0]
    for i in range(len(image_stack)):
        shift_row = int(shift_vectors[i][0])
        shift_col = int(shift_vectors[i][1])
        orm = int(np.maximum(0, shift_row))
        orx = int(image_shape + np.minimum(0, shift_row))
        ocm = int(np.maximum(0, shift_col))
        ocx = int(image_shape + np.minimum(0, shift_col))
        rrm = int(-np.minimum(0, shift_row))
        rrx = int(image_shape - np.maximum(0, shift_row))
        rcm = int(-np.minimum(0, shift_col))
        rcx = int(image_shape - np.maximum(0, shift_col))
        image_registered[i][orm:orx, ocm:ocx, :] = \
            image_stack[i][rrm:rrx, rcm:rcx, :]
    image_channel = np.dstack(image_registered)
    if calibration is not None:
        image_channel = image_channel / np.asarray(calibration)
    image_registered_sum = np.sum(image_channel, axis=2)
    image_registered_sum_norm = image_registered_sum / \
        np.max(image_registered_sum)
    image_registered_sum_nl = skim.denoise_nl_means(
        image_registered_sum_norm, h=0.02)
    image_padded = np.pad(image_registered_sum_nl, 5, mode="edge")
    image_lp = line_profile_2d_v2(image_padded.astype(np.float64), 11, 9)
    image_lp = np.nan_to_num(image_lp)
    image_lp_min = np.min(image_lp, axis=3)
    image_lp_max = np.max(image_lp, axis=3)
    image_lp_max = image_lp_max - image_lp_min
    image_lp = image_lp - image_lp_min[:, :, :, None]
    with np.errstate(invalid="ignore", divide="ignore"):
        image_lp_rel_norm = image_lp / image_lp_max[:, :, :, None]
    image_lp_rel_norm = np.nan_to_num(image_lp_rel_norm)
    image_lp_rnc = image_lp_rel_norm[:, :, :, 5]
    image_lprns = np.average(image_lp_rnc, axis=2)
    image_lprn_lq = np.percentile(image_lp_rnc, 25, axis=2)
    image_lprn_uq = np.percentile(image_lp_rnc, 75, axis=2)
    image_lprn_qcv = np.zeros(image_lprn_uq.shape)
    image_lprn_qcv_pre = (image_lprn_uq - image_lprn_lq) / \
        (image_lprn_uq + image_lprn_lq + 1e-8)
    image_lprn_qcv[image_lprn_uq > 0] = image_lprn_qcv_pre[image_lprn_uq > 0]
    image_final = image_lprns * (1 - image_lprn_qcv)

    intensity_rough_seg = _kmeans_labels(image_final, 2).reshape(
        image_final.shape)
    image0 = image_final * (intensity_rough_seg == 0)
    image1 = image_final * (intensity_rough_seg == 1)
    i0 = np.average(image0[image0 > 0])
    i1 = np.average(image1[image1 > 0])
    if i0 < i1:
        intensity_rough_seg_mask = intensity_rough_seg == 1
    else:
        intensity_rough_seg_mask = intensity_rough_seg == 0
    image_lprns_rsfbo = skim.binary_opening(intensity_rough_seg_mask)
    image_lprns_rsfbosm = skim.remove_small_objects(image_lprns_rsfbo, 10)
    image_lprns_rsfbosm_bfh = binary_fill_holes(image_lprns_rsfbosm)
    intensity_rough_seg_mask_bfh = binary_fill_holes(intensity_rough_seg_mask)
    image_watershed_seeds = skim.label(
        image_lprns_rsfbosm_bfh * intensity_rough_seg_mask_bfh)
    image_bkg_filter = _kmeans_labels(image_registered_sum_nl, 2).reshape(
        image_registered_sum_nl.shape)
    image0 = image_registered_sum_nl * (image_bkg_filter == 0)
    image1 = image_registered_sum_nl * (image_bkg_filter == 1)
    i0 = np.average(image0[image0 > 0])
    i1 = np.average(image1[image1 > 0])
    if i0 < i1:
        image_bkg_filter_mask = image_bkg_filter == 1
    else:
        image_bkg_filter_mask = image_bkg_filter == 0
    image_final_bkg_filtered = image_final * image_bkg_filter_mask
    image_watershed_seeds_bkg_filtered = \
        image_watershed_seeds * image_bkg_filter_mask
    image_watershed_mask_bkg_filtered = \
        intensity_rough_seg_mask * image_bkg_filter_mask
    image_seg = skim.watershed(
        -image_final_bkg_filtered, image_watershed_seeds_bkg_filtered,
        mask=image_watershed_mask_bkg_filtered)
    image_seg = skim.remove_small_objects(image_seg, 60)
    image_seg = skim.clear_border(image_seg)
    image_seg = skim.relabel_sequential(image_seg)[0]
    return image_registered_sum, image_channel, image_final_bkg_filtered, \
        image_seg


def measure_avgint(segmentation: np.ndarray, image: np.ndarray) -> np.ndarray:
    """Per-channel regionprops mean_intensity loop
    (spectral_image_measurement.py:151-155 / multispecies...py:167-171):
    rows ordered by increasing label."""
    cells = skim.regionprops(segmentation)
    avgint = np.empty((len(cells), image.shape[2]))
    for k in range(image.shape[2]):
        cells = skim.regionprops(segmentation, intensity_image=image[:, :, k])
        avgint[:, k] = [x.mean_intensity for x in cells]
    return avgint
