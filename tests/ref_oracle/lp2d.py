"""Numpy re-derivation of the reference's Cython line-profile stencil.

``line_profile_2d_v2`` (neighbor2d.pyx:8-64) builds, per angle phi in
[0, pi), an integer coordinate table tracing a line of ``patch_size``
samples through the patch center, then gathers those samples for every
pixel of the padded image. The table math below reproduces the pyx
arithmetic exactly (true division, sign/floor rounding, short-line
head/tail replication); the gather is vectorized as shifted views instead
of the reference's quadruple loop.
"""

from __future__ import annotations

import numpy as np


def line_tables(patch_size: int, phi_range: int) -> np.ndarray:
    """(patch_size, 2, phi_range) integer sample coordinates per angle."""
    inc = (patch_size - 1) // 2
    tables = np.zeros((patch_size, 2, phi_range), np.int64)
    for phi in range(phi_range):
        iv = np.array([
            int(np.round(inc * np.cos(phi * np.pi / phi_range))),
            int(np.round(inc * np.sin(phi * np.pi / phi_range))),
        ])
        max_iv = iv[np.argmax(np.abs(iv))]
        signs = np.sign(iv)
        line_n = int(2 * abs(max_iv) + 1)

        def coord(li: int, k: int) -> int:
            hval = signs[k] * li * (2 * abs(iv[k]) + 1) / line_n
            return int(np.sign(hval) * np.floor(np.abs(hval)) + inc - iv[k])

        if line_n < patch_size:
            diff = (patch_size - line_n) // 2
            for li in range(line_n):
                tables[li + diff, 0, phi] = coord(li, 0)
                tables[li + diff, 1, phi] = coord(li, 1)
            tables[:diff, :, phi] = tables[diff, :, phi]
            tables[line_n + diff:line_n + 2 * diff, :, phi] = \
                tables[line_n + diff - 1, :, phi]
        else:
            for li in range(line_n):
                tables[li, 0, phi] = coord(li, 0)
                tables[li, 1, phi] = coord(li, 1)
    return tables


def line_profile_2d_v2(image_padded: np.ndarray, patch_size: int,
                       phi_range: int) -> np.ndarray:
    """(H, W, phi_range, patch_size) line profiles of a padded 2D image."""
    image_padded = np.asarray(image_padded, np.float64)
    tables = line_tables(patch_size, phi_range)
    hs = image_padded.shape[0] - (patch_size - 1)
    ws = image_padded.shape[1] - (patch_size - 1)
    lp = np.zeros((hs, ws, phi_range, patch_size))
    for t in range(phi_range):
        for li in range(patch_size):
            vi = int(tables[li, 0, t])
            vj = int(tables[li, 1, t])
            lp[:, :, t, li] = image_padded[vi:vi + hs, vj:vj + ws]
    return lp
