"""L3: per-cell spectral measurement.

The reference loops regionprops once per channel — 95 full-image passes
(spectral_image_measurement.py:153-155). Here the mean spectrum of every cell
across every channel is one segment_sum pass (ops/regionprops.mean_intensities)
on device; the host only trims the static-shape result to n_cells rows and
writes the CSV artifacts.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from hiprfish_tpu.io import outputs
from hiprfish_tpu.ops import regionprops as rp


@functools.partial(jax.jit, static_argnums=(2,))
def measure_device(labels: jax.Array, image: jax.Array, max_cells: int):
    """(max_cells, C) per-cell mean spectra (row 0 = background slot) plus
    row-max normalized spectra."""
    avg = rp.mean_intensities(labels, image, max_cells)
    norm = avg / jnp.maximum(jnp.max(avg, axis=1, keepdims=True), 1e-12)
    return avg, norm


def measure_fov(segmentation, registered, n_cells: int, max_cells: int = 4096):
    """Host wrapper: returns (avgint, avgint_norm) numpy arrays of shape
    (n_cells, C), rows ordered by label id (the reference's regionprops row
    order contract, SURVEY.md §2.4)."""
    avg, norm = measure_device(segmentation, registered, max_cells)
    n = int(n_cells)
    return np.asarray(avg)[1 : n + 1], np.asarray(norm)[1 : n + 1]


def save_measurement(sample: str, avgint: np.ndarray, avgint_norm: np.ndarray,
                     segmentation, with_header: bool = False) -> None:
    """Persist the measurement artifacts for one FOV.

    with_header=False: ecoli savetxt style (spectral_image_measurement.py:160);
    True: synthetic-community pandas style (multispecies...py:173).
    """
    outputs.save_avgint_csv(sample + "_avgint.csv", avgint)
    if with_header:
        outputs.save_avgint_norm_csv_with_header(
            sample + "_avgint_norm.csv", avgint_norm
        )
    else:
        outputs.save_avgint_csv(sample + "_avgint_norm.csv", avgint_norm)
    outputs.save_segmentation(np.asarray(segmentation), sample)
