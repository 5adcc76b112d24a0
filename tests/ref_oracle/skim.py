"""The subset of scikit-image the reference uses, re-implemented from
skimage's documented algorithms in numpy/scipy (skimage itself is not
installed). Function names and defaults mirror skimage so the pipeline
transcriptions in ``pipelines.py`` read like the reference sources.
"""

from __future__ import annotations

import heapq

import numpy as np
from scipy import ndimage as ndi


def _structure(ndim: int, connectivity: int):
    return ndi.generate_binary_structure(ndim, connectivity)


# ---------------------------------------------------------------------------
# skimage.feature.register_translation (upsample_factor=1)
# ---------------------------------------------------------------------------


def register_translation(src: np.ndarray, target: np.ndarray) -> np.ndarray:
    """Integer-pixel phase cross-correlation, skimage's upsample_factor=1
    path: argmax of the inverse-FFT cross-correlation, with shifts above the
    axis midpoint wrapped negative."""
    f_src = np.fft.fftn(src)
    f_tgt = np.fft.fftn(target)
    cc = np.fft.ifftn(f_src * f_tgt.conj())
    maxima = np.unravel_index(np.argmax(np.abs(cc)), cc.shape)
    shifts = np.array(maxima, dtype=np.float64)
    midpoints = np.array([np.fix(s / 2) for s in cc.shape])
    shape = np.array(cc.shape, dtype=np.float64)
    shifts[shifts > midpoints] -= shape[shifts > midpoints]
    return shifts


# ---------------------------------------------------------------------------
# skimage.morphology binary ops (cross footprint, erosion border_value=1)
# ---------------------------------------------------------------------------


def binary_erosion(a: np.ndarray) -> np.ndarray:
    """skimage default: connectivity-1 cross footprint; out-of-image treated
    as foreground (ndi border_value=1), so regions touching the border are
    not eroded from outside."""
    a = np.asarray(a).astype(bool)
    return ndi.binary_erosion(a, _structure(a.ndim, 1), border_value=1)


def binary_dilation(a: np.ndarray) -> np.ndarray:
    a = np.asarray(a).astype(bool)
    return ndi.binary_dilation(a, _structure(a.ndim, 1), border_value=0)


def binary_opening(a: np.ndarray) -> np.ndarray:
    return binary_dilation(binary_erosion(a))


def remove_small_objects(ar: np.ndarray, min_size: int = 64,
                         connectivity: int = 1) -> np.ndarray:
    """Bool input: connected components (given connectivity) smaller than
    min_size are cleared. Integer input: values are taken as labels and
    whole labels below min_size are cleared (skimage semantics)."""
    ar = np.asarray(ar)
    out = ar.copy()
    if out.dtype == bool:
        ccs, _ = ndi.label(out, _structure(out.ndim, connectivity))
    else:
        ccs = out
    sizes = np.bincount(ccs.ravel())
    too_small = sizes < min_size
    too_small[0] = False
    out[too_small[ccs]] = 0
    return out


def remove_small_holes(ar: np.ndarray, area_threshold: int = 64,
                       connectivity: int = 1) -> np.ndarray:
    """Fill background components with area <= area_threshold (skimage:
    complement + remove_small_objects + complement)."""
    ar = np.asarray(ar).astype(bool)
    comp, _ = ndi.label(~ar, _structure(ar.ndim, connectivity))
    sizes = np.bincount(comp.ravel())
    small = sizes <= area_threshold
    small[0] = False
    return ar | small[comp]


def label(a: np.ndarray, connectivity: int | None = None) -> np.ndarray:
    """skimage.measure.label: default connectivity = ndim (8-connected in
    2D), labels assigned in raster-scan order."""
    a = np.asarray(a)
    mask = a.astype(bool) if a.dtype != bool else a
    conn = a.ndim if connectivity is None else connectivity
    lbl, _ = ndi.label(mask, _structure(a.ndim, conn))
    return lbl


def clear_border(labels: np.ndarray) -> np.ndarray:
    """Zero every label (or mask component) touching the image border."""
    arr = np.asarray(labels)
    was_bool = arr.dtype == bool
    lbl = label(arr, connectivity=arr.ndim) if was_bool else arr.copy()
    border = np.zeros(lbl.shape, bool)
    for ax in range(lbl.ndim):
        sl = [slice(None)] * lbl.ndim
        sl[ax] = 0
        border[tuple(sl)] = True
        sl[ax] = -1
        border[tuple(sl)] = True
    bad = np.unique(lbl[border])
    out = lbl.copy()
    out[np.isin(lbl, bad[bad > 0])] = 0
    return out.astype(bool) if was_bool else out


def relabel_sequential(labels: np.ndarray):
    """(relabeled, forward_map): positive labels -> 1..n preserving order."""
    labels = np.asarray(labels)
    ids = np.unique(labels)
    ids = ids[ids > 0]
    fw = np.zeros(int(labels.max()) + 1 if labels.size else 1, labels.dtype)
    fw[ids] = np.arange(1, len(ids) + 1, dtype=labels.dtype)
    return fw[labels], fw


# ---------------------------------------------------------------------------
# skimage.morphology.watershed
# ---------------------------------------------------------------------------


def watershed(image: np.ndarray, markers: np.ndarray,
              mask: np.ndarray | None = None,
              connectivity: int = 1) -> np.ndarray:
    """Priority-flood watershed (skimage's hierarchical-queue algorithm):
    marker pixels seed a heap ordered by (surface value, insertion age);
    popped pixels label their unlabeled in-mask neighbors, which enqueue at
    their own surface value."""
    image = np.asarray(image, np.float64)
    markers = np.asarray(markers)
    if mask is None:
        mask = np.ones(image.shape, bool)
    mask = np.asarray(mask).astype(bool)
    structure = _structure(image.ndim, connectivity)
    offsets = [
        tuple(int(k) - 1 for k in idx)
        for idx in np.argwhere(structure)
        if any(int(k) != 1 for k in idx)
    ]
    output = np.where(mask, markers, 0).astype(np.int64)
    flat_img = image.ravel()
    flat_out = output.ravel()
    flat_mask = mask.ravel()
    strides = np.array(
        [int(np.prod(image.shape[d + 1:], dtype=np.int64))
         for d in range(image.ndim)])
    coords = np.argwhere(output > 0)
    heap = []
    age = 0
    for idx in coords:
        p = int(np.dot(idx, strides))
        heapq.heappush(heap, (flat_img[p], age, p))
        age += 1
    shape = image.shape
    while heap:
        _, _, p = heapq.heappop(heap)
        lbl = flat_out[p]
        # decode p -> multi-index once per pop
        rem = p
        pos = []
        for s in strides:
            pos.append(rem // s)
            rem %= s
        for off in offsets:
            ok = True
            q = 0
            for d in range(image.ndim):
                nd = pos[d] + off[d]
                if nd < 0 or nd >= shape[d]:
                    ok = False
                    break
                q += nd * strides[d]
            if ok and flat_mask[q] and flat_out[q] == 0:
                flat_out[q] = lbl
                heapq.heappush(heap, (flat_img[q], age, int(q)))
                age += 1
    return output


# ---------------------------------------------------------------------------
# skimage.measure.regionprops (area / mean_intensity / axis lengths)
# ---------------------------------------------------------------------------


class _Region:
    __slots__ = ("label", "area", "mean_intensity", "minor_axis_length",
                 "major_axis_length", "centroid")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def regionprops(labels: np.ndarray, intensity_image: np.ndarray | None = None):
    """Regions in increasing label order with the properties the reference
    reads. Axis lengths follow skimage: 4*sqrt(eigenvalue) of the normalized
    inertia tensor of the pixel coordinates."""
    labels = np.asarray(labels).astype(np.int64)
    ids = np.unique(labels)
    ids = ids[ids > 0]
    if len(ids) == 0:
        return []
    r, c = np.nonzero(labels)
    l = labels[r, c]
    nmax = int(ids.max()) + 1
    area = np.bincount(l, minlength=nmax).astype(np.float64)
    sr = np.bincount(l, weights=r, minlength=nmax)
    sc = np.bincount(l, weights=c, minlength=nmax)
    srr = np.bincount(l, weights=r * r.astype(np.float64), minlength=nmax)
    scc = np.bincount(l, weights=c * c.astype(np.float64), minlength=nmax)
    src = np.bincount(l, weights=r * c.astype(np.float64), minlength=nmax)
    with np.errstate(invalid="ignore", divide="ignore"):
        rbar = sr / area
        cbar = sc / area
        mu20 = srr / area - rbar**2
        mu02 = scc / area - cbar**2
        mu11 = src / area - rbar * cbar
    t = (mu20 + mu02) / 2.0
    d = np.sqrt(np.maximum(4.0 * mu11**2 + (mu20 - mu02) ** 2, 0.0)) / 2.0
    l1 = np.maximum(t + d, 0.0)
    l2 = np.maximum(t - d, 0.0)
    if intensity_image is not None:
        vals = np.asarray(intensity_image, np.float64)[r, c]
        isum = np.bincount(l, weights=vals, minlength=nmax)
    regions = []
    for i in ids:
        regions.append(_Region(
            label=int(i),
            area=float(area[i]),
            mean_intensity=(float(isum[i] / area[i])
                            if intensity_image is not None else None),
            major_axis_length=4.0 * np.sqrt(l1[i]),
            minor_axis_length=4.0 * np.sqrt(l2[i]),
            centroid=(float(rbar[i]), float(cbar[i])),
        ))
    return regions


# ---------------------------------------------------------------------------
# skimage.restoration.denoise_nl_means (fast_mode, sigma=0)
# ---------------------------------------------------------------------------


def denoise_nl_means(image: np.ndarray, h: float = 0.02,
                     patch_size: int = 7, patch_distance: int = 11
                     ) -> np.ndarray:
    """Fast-mode non-local means (Darbon et al.): per search offset, the
    patch distance is the box-filtered squared difference image; weight =
    exp(-mean_patch_sq_diff / h^2). Full search window, reflect padding."""
    img = np.asarray(image, np.float64)
    f = patch_size // 2
    pad = patch_distance + f
    padded = np.pad(img, pad, mode="reflect")
    H, W = img.shape
    out = np.zeros((H, W))
    wsum = np.zeros((H, W))
    h2 = h * h
    # Window enclosing all patches of valid pixels, so the box filter never
    # touches the reflected border within the crop.
    y0, y1 = pad - f, pad + H + f
    x0, x1 = pad - f, pad + W + f
    center = padded[y0:y1, x0:x1]
    for dr in range(-patch_distance, patch_distance + 1):
        for dc in range(-patch_distance, patch_distance + 1):
            shifted = padded[y0 + dr:y1 + dr, x0 + dc:x1 + dc]
            d2 = ndi.uniform_filter((center - shifted) ** 2, patch_size)
            w = np.exp(-np.maximum(d2[f:f + H, f:f + W], 0.0) / h2)
            out += w * shifted[f:f + H, f:f + W]
            wsum += w
    return out / wsum
