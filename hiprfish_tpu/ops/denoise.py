"""Non-local-means denoising on TPU.

Replaces skimage.restoration.denoise_nl_means(h=0.02) used ahead of the LP-CV
enhancement (multispecies_spectral_image_measurement.py:108,
biofilm_analysis.py:350). The fast-mode NLM algorithm — per search offset,
compare patch means via a box filter of the squared difference image —
vectorizes cleanly: lax.scan over the (2d+1)^2 search offsets, each step a
roll + box filter + fused exp/accumulate. The box filter is a separable
cumulative-sum difference, so one scan step is O(HW).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _box_mean(img: jax.Array, size: int):
    """Mean filter with a (size x size) window, edge-padded, same-size out."""
    half = size // 2
    p = jnp.pad(img, half, mode="edge")
    # Integral-image trick along each axis.
    c = jnp.cumsum(p, axis=0)
    c = jnp.pad(c, ((1, 0), (0, 0)))
    rows = c[size:, :] - c[:-size, :]
    c2 = jnp.cumsum(rows, axis=1)
    c2 = jnp.pad(c2, ((0, 0), (1, 0)))
    out = c2[:, size:] - c2[:, :-size]
    return out / (size * size)


@functools.partial(jax.jit, static_argnums=(1, 2))
def estimate_sigma(image: jax.Array, *_args, **_kwargs):
    """Robust noise-sigma estimate (median absolute deviation of the
    Laplacian-like residual). The reference computes skimage's wavelet
    estimate but never uses the value (multispecies...py:107) — kept for API
    parity."""
    img = image.astype(jnp.float32)
    dx = img[1:, :] - img[:-1, :]
    return jnp.median(jnp.abs(dx)) / 0.6745 / jnp.sqrt(2.0)


@functools.partial(jax.jit, static_argnums=(2, 3))
def denoise_nl_means(
    image: jax.Array,
    h: float = 0.02,
    patch_size: int = 7,
    patch_distance: int = 11,
):
    """Fast-mode non-local means of an (H, W) image.

    weight(offset) = exp(-max(d2, 0) / h^2) with d2 the (size^2-normalized)
    patch-mean squared difference, accumulated over all offsets in the
    (2*patch_distance+1)^2 search window — the skimage fast_mode formulation
    with sigma = 0.
    """
    img = image.astype(jnp.float32)
    pd = patch_distance
    # Pad so wrap-around from jnp.roll never contaminates the valid region.
    padded = jnp.pad(img, pd, mode="reflect")

    # Only half the search window is scanned: the patch distance is
    # symmetric, D_{-o}(p) = D_o(p+o), so each offset o also yields the -o
    # contribution via one roll of the weighted image — halving the box
    # filters (the expensive part of each step).
    half = [
        (dy, dx)
        for dy in range(-pd, pd + 1)
        for dx in range(-pd, pd + 1)
        if (dy, dx) > (0, 0)
    ]
    offsets = jnp.asarray(np.array(half), jnp.int32)

    h2 = jnp.float32(h * h)

    def step(carry, off):
        acc, wacc = carry
        shifted_img = jnp.roll(padded, (off[0], off[1]), axis=(0, 1))
        d2 = _box_mean((padded - shifted_img) ** 2, patch_size)
        wgt = jnp.exp(-jnp.maximum(d2, 0.0) / h2)
        # +o contribution at p, and the mirrored -o contribution at p+o.
        acc = acc + wgt * shifted_img
        wacc = wacc + wgt
        acc = acc + jnp.roll(wgt * padded, (-off[0], -off[1]), axis=(0, 1))
        wacc = wacc + jnp.roll(wgt, (-off[0], -off[1]), axis=(0, 1))
        return (acc, wacc), None

    # Self term (offset 0): weight exp(0) = 1.
    (acc, wacc), _ = jax.lax.scan(
        step, (padded, jnp.ones_like(padded)), offsets
    )
    out = acc / jnp.maximum(wacc, 1e-12)
    return out[pd:-pd, pd:-pd]


def denoise_nl_means_auto(image, h: float = 0.02, patch_size: int = 7,
                          patch_distance: int = 11):
    """Backend dispatcher: the Pallas VMEM-tiled kernel on TPU, the XLA scan
    formulation elsewhere. Decided at trace time."""
    import jax

    if jax.default_backend() not in ("cpu", "gpu"):
        from hiprfish_tpu.ops.nlm_pallas import denoise_nl_means_pallas

        return denoise_nl_means_pallas(image, h, patch_size, patch_distance)
    return denoise_nl_means(image, h, patch_size, patch_distance)
