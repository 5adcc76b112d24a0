"""Synthetic spectral-FOV generator for tests and benchmarks.

The reference has no test suite (SURVEY.md §4); its de-facto validation is
known-barcode ground truth baked into experiments. This module recreates that
strategy synthetically: FOVs of rod/ellipse-shaped cells with known binary
barcodes, per-fluorophore emission spectra consistent with the per-laser
check-bit groups, optional per-laser registration shifts, noise, and a
brightness gradient — so segmentation, measurement, classification, and
error-rate collection can all be validated end-to-end without microscope data.
"""

from __future__ import annotations

import numpy as np

from hiprfish_tpu.config import ChannelLayout


def fluorophore_spectra(layout: ChannelLayout, sharpness: float = 6.0) -> np.ndarray:
    """(n_bits, C) per-fluorophore emission spectra.

    Fluorophore k emits a Gaussian bump inside every laser block whose
    check-bit group contains k (so block energy <-> check bit), with a
    distinct peak position per fluorophore for discriminability.
    """
    spectra = np.zeros((layout.n_bits, layout.n_channels), np.float64)
    for block_idx, group in enumerate(layout.check_bit_groups):
        if block_idx >= len(layout.blocks):
            continue  # derived blocks (e.g. violet derivative) have no channels
        lo, hi = layout.blocks[block_idx]
        width = hi - lo
        for rank, bit in enumerate(sorted(group)):
            center = lo + (rank + 1) / (len(group) + 1) * width
            ch = np.arange(layout.n_channels)
            spectra[bit] += np.exp(
                -((ch - center) ** 2) / (2 * (width / sharpness) ** 2)
            )
    # Normalize each fluorophore to unit peak.
    peaks = spectra.max(axis=1, keepdims=True)
    return spectra / np.maximum(peaks, 1e-12)


def barcode_spectrum(layout: ChannelLayout, code: int,
                     spectra: np.ndarray | None = None) -> np.ndarray:
    """(C,) mean spectrum of a barcode = sum of its fluorophores' spectra."""
    if spectra is None:
        spectra = fluorophore_spectra(layout)
    bits = [int(b) for b in layout.code_str(code)]
    out = np.zeros(layout.n_channels)
    for k, on in enumerate(bits):
        if on:
            out += spectra[k]
    # Unit peak: cells carry a similar total stain load regardless of how
    # many fluorophores their barcode uses (matches row-max normalization
    # downstream and keeps the fg/bkg KMeans bimodal).
    return out / max(out.max(), 1e-12)


def make_fov(
    layout: ChannelLayout,
    barcodes,
    shape=(256, 256),
    seed: int = 0,
    laser_shifts=None,
    cell_axes=(9.0, 15.0),
    brightness: float = 1.0,
    noise: float = 0.01,
    grid_jitter: float = 0.25,
    spacing: float | None = None,
):
    """Generate per-laser images of a synthetic FOV.

    Args:
      barcodes: list of integer barcode ids, one per cell, placed on a
        jittered grid.
      laser_shifts: optional (n_lasers, 2) integer shifts applied per laser to
        exercise registration.
      spacing: optional grid pitch in pixels. Default spreads the grid over
        the whole FOV (sparse, non-touching). Setting it near the cell
        diameter packs the cells into a dense centered cluster where
        neighbors touch — the production-density regime watershed parity
        must be demonstrated in.

    Returns dict with:
      stack: list of per-laser (H, W, C_l) float32 arrays
      truth_labels: (H, W) int ground-truth cell labels (1..n, row-major grid order)
      truth_barcodes: list of barcode ids per label
      spectra: (n_bits, C) fluorophore spectra used
    """
    rng = np.random.RandomState(seed)
    h, w = shape
    n = len(barcodes)
    spectra = fluorophore_spectra(layout)
    grid = int(np.ceil(np.sqrt(n)))
    margin = max(cell_axes) + 12
    if spacing is None:
        ys = np.linspace(margin, h - margin, grid)
        xs = np.linspace(margin, w - margin, grid)
        positions = None
    else:
        # Dense mode: Poisson-disk (random sequential adsorption) cluster —
        # a central microcolony with near-contact nearest neighbors and NO
        # lattice. Any grid arrangement (even with jittered pitch) keeps
        # rows globally phase-aligned, and full-frame phase registration
        # (the reference's) then locks onto row-pitch lags instead of the
        # stage shift (measured: planted (1,1) found (-2,92) periodic /
        # (28,2) with jittered pitch). Real colonies have short-range order
        # only, which rejection sampling reproduces.
        min_dist = 0.85 * spacing
        extent = float(np.sqrt(n * spacing * spacing * 1.6))
        y0 = max(margin, (h - extent) / 2)
        x0 = max(margin, (w - extent) / 2)
        y1 = min(h - margin, y0 + extent)
        x1 = min(w - margin, x0 + extent)
        pts: list = []
        tries = 0
        while len(pts) < n and tries < 400 * n:
            tries += 1
            cy = rng.uniform(y0, y1)
            cx = rng.uniform(x0, x1)
            ok = True
            for py, px in pts:
                if (py - cy) ** 2 + (px - cx) ** 2 < min_dist * min_dist:
                    ok = False
                    break
            if ok:
                pts.append((cy, cx))
        while len(pts) < n:   # jammed: drop the distance constraint
            pts.append((rng.uniform(y0, y1), rng.uniform(x0, x1)))
        positions = pts
    jitter_px = 4.0
    yy, xx = np.mgrid[:h, :w]

    image = np.zeros((h, w, layout.n_channels), np.float32)
    truth = np.zeros((h, w), np.int32)
    win = int(np.ceil(max(cell_axes))) + 2
    for i, code in enumerate(barcodes):
        if positions is not None:
            cy, cx = positions[i]
        else:
            cy = ys[i // grid] + rng.uniform(-1, 1) * jitter_px
            cx = xs[i % grid] + rng.uniform(-1, 1) * jitter_px
        theta = rng.uniform(0, np.pi)
        a, b = cell_axes  # semi-minor, semi-major
        # Rasterize only the cell's bounding window (O(cells * window), not
        # O(cells * image)).
        r0 = max(0, int(cy) - win)
        r1 = min(h, int(cy) + win + 1)
        c0 = max(0, int(cx) - win)
        c1 = min(w, int(cx) + win + 1)
        dy = yy[r0:r1, c0:c1] - cy
        dx = xx[r0:r1, c0:c1] - cx
        u = dy * np.cos(theta) + dx * np.sin(theta)
        v = -dy * np.sin(theta) + dx * np.cos(theta)
        r2 = (u / b) ** 2 + (v / a) ** 2
        inside = r2 <= 1.0
        # Mild brightness gradient: a brighter interior so the KMeans(3)
        # layer pick isolates cell cores (spectral_image_measurement.py:85-95)
        # while KMeans(2) still captures the whole cell as foreground.
        profile = np.where(inside, 1.0 - 0.2 * np.sqrt(np.clip(r2, 0, 1)), 0.0)
        spec = barcode_spectrum(layout, code, spectra)
        cell_gain = brightness * rng.uniform(0.8, 1.2)
        image[r0:r1, c0:c1] += profile[:, :, None] * spec[None, None, :] * cell_gain
        tw = truth[r0:r1, c0:c1]
        tw[inside & (tw == 0)] = i + 1

    noise_rng = np.random.default_rng(seed + 1)
    image += noise_rng.random((h, w, layout.n_channels), np.float32) * noise

    # Split into per-laser blocks and apply per-laser shifts.
    stack = []
    for li, (lo, hi) in enumerate(layout.blocks):
        plane = image[:, :, lo:hi]
        if laser_shifts is not None:
            sr, sc = laser_shifts[li]
            plane = np.roll(plane, (int(sr), int(sc)), axis=(0, 1))
        stack.append(plane.astype(np.float32))

    return {
        "stack": stack,
        "truth_labels": truth,
        "truth_barcodes": list(barcodes),
        "spectra": spectra,
    }


def write_reference_folder(
    layout: ChannelLayout,
    folder: str,
    encs,
    cells_per_code: int = 60,
    seed: int = 0,
    prefix: str = "08_18_2018",
    noise: float = 0.02,
    write_norm: bool = False,
) -> None:
    """Write synthetic measured-reference CSVs ('{prefix}_enc_<n>_avgint.csv')
    for each barcode — the on-disk interface the training builders glob
    (train_reference.py:58). Rows are noisy per-cell mean spectra with random
    per-cell gain, mimicking real reference measurements."""
    import os

    os.makedirs(folder, exist_ok=True)
    rng = np.random.RandomState(seed)
    spectra = fluorophore_spectra(layout)
    for enc in encs:
        spec = barcode_spectrum(layout, enc, spectra)
        gains = rng.uniform(0.7, 1.3, (cells_per_code, 1))
        rows = gains * spec[None, :] + rng.randn(
            cells_per_code, layout.n_channels
        ) * noise * spec.max()
        rows = np.clip(rows, 0, None)
        path = os.path.join(folder, f"{prefix}_enc_{enc}_avgint.csv")
        np.savetxt(path, rows, delimiter=",")
        if write_norm:
            norm = rows / np.maximum(rows.max(axis=1, keepdims=True), 1e-12)
            np.savetxt(
                os.path.join(folder, f"{prefix}_enc_{enc}_avgint_norm.csv"),
                norm, delimiter=",")
