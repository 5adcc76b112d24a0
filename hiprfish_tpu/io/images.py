"""Spectral image ingestion (replaces the reference's javabridge/bioformats
JVM path, spectral_image_measurement.py:31,145).

Formats:
  * .czi  — Zeiss ZISRAW container via the bundled pure-host reader
            (hiprfish_tpu.io.czi); uncompressed subblocks.
  * .npy  — (H, W, C) float arrays, used by tests/benchmarks and as the
            interchange format for pre-converted data.
  * .tif  — via imageio when available.

Loader functions mirror the reference's access patterns: whole-FOV per-laser
planes, z-stacks at fixed t, and tile series (biofilm_analysis.py:55-132).
"""

from __future__ import annotations

import os

import numpy as np


def load_image(filename: str, z: int | None = None, t: int | None = None,
               series: int | None = None) -> np.ndarray:
    """Load one (H, W, C) image plane (bioformats.load_image equivalent)."""
    ext = os.path.splitext(filename)[1].lower()
    if ext == ".npy":
        arr = np.load(filename)
        if z is not None or t is not None or series is not None:
            # npy z-stacks stored as (T?, Z?, H, W, C) are indexed explicitly
            # by the z-stack loaders below; a plain plane ignores z/t.
            pass
        return np.asarray(arr)
    if ext == ".czi":
        from hiprfish_tpu.io import czi

        return czi.CziFile(filename).load_plane(z=z or 0, t=t or 0,
                                                series=series or 0)
    if ext in (".tif", ".tiff"):
        import imageio.v3 as iio

        arr = np.asarray(iio.imread(filename))
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return arr
    raise ValueError(f"unsupported image format: {filename}")


def load_image_stack(filenames) -> list:
    """Per-laser image planes for one FOV."""
    return [load_image(f) for f in filenames]


def get_z_range(filename: str) -> int:
    ext = os.path.splitext(filename)[1].lower()
    if ext == ".czi":
        from hiprfish_tpu.io import czi

        return czi.CziFile(filename).size_z
    if ext == ".npy":
        arr = np.load(filename, mmap_mode="r")
        return arr.shape[0] if arr.ndim == 4 else 1
    raise ValueError(filename)


def get_t_range(filename: str) -> int:
    ext = os.path.splitext(filename)[1].lower()
    if ext == ".czi":
        from hiprfish_tpu.io import czi

        return czi.CziFile(filename).size_t
    return 1


def get_tile_count(filename: str) -> int:
    ext = os.path.splitext(filename)[1].lower()
    if ext == ".czi":
        from hiprfish_tpu.io import czi

        return czi.CziFile(filename).n_series
    return 1


def load_image_zstack_fixed_t(filename: str, t: int = 0) -> np.ndarray:
    """(X, Y, Z, C) z-stack at fixed time (biofilm_analysis.py:108-111)."""
    ext = os.path.splitext(filename)[1].lower()
    if ext == ".npy":
        arr = np.load(filename)
        # stored (Z, H, W, C) -> (H, W, Z, C)
        if arr.ndim == 4:
            return np.moveaxis(arr, 0, 2)
        raise ValueError(f"npy z-stack must be (Z, H, W, C): {filename}")
    if ext == ".czi":
        from hiprfish_tpu.io import czi

        f = czi.CziFile(filename)
        planes = [f.load_plane(z=k, t=t) for k in range(f.size_z)]
        return np.stack(planes, axis=2)
    raise ValueError(filename)


def load_calibration_image(filename: str) -> np.ndarray:
    return np.load(filename)


def build_calibration_cube(calibration_image: np.ndarray, n_channels: int,
                           block_end: int = 32) -> np.ndarray:
    """Replicate a single flat-field image into channels [0, block_end) of an
    (H, W, n_channels) cube of ones (load_calibration_images,
    spectral_image_measurement.py:33-38: only the 405 block is corrected)."""
    cal = np.ones(
        (calibration_image.shape[0], calibration_image.shape[1], n_channels),
        np.float32,
    )
    cal[:, :, :block_end] = calibration_image[:, :, None]
    return cal
