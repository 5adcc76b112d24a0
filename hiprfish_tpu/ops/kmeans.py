"""Jitted Lloyd KMeans for 1-D intensity clustering.

The reference calls sklearn KMeans(n_clusters=2 or 3, random_state=0) on
flattened pixel intensities 14x across the repo to split foreground from
background (e.g. hiprfish_imaging_spectral_image_measurement.py:73,85;
hiprfish_imaging_multispecies_spectral_image_measurement.py:125,141). The
downstream logic only consumes "cluster with the highest mean intensity", so a
deterministic fixed-iteration Lloyd solver with quantile seeding reproduces the
behavior while staying inside jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def kmeans1d_centers(values: jax.Array, k: int, iters: int = 40,
                     n_bins: int = 2048):
    """Sorted-ascending cluster centers only — no full-size assignment.

    The (N, k) distance matrix of the final labeling is the only O(N*k)
    buffer in kmeans1d; on gigavoxel volumes that alone is several GB, and
    callers that just need a decision threshold (the tiled 3D engine) never
    want it.
    """
    v = values.reshape(-1).astype(jnp.float32)
    vmin = jnp.min(v)
    vmax = jnp.max(v)
    span = jnp.maximum(vmax - vmin, 1e-12)
    # Histogram of values (weights = counts, sums = per-bin value mass).
    # Center fitting is statistical: build the histogram from a strided
    # subsample (assignment below stays exact on the full data) — the 4M-
    # element scatter otherwise dominates the whole call.
    max_hist = 1 << 19
    stride = max(1, v.shape[0] // max_hist)
    vs = v[::stride]
    idx = jnp.clip(((vs - vmin) / span * (n_bins - 1)).astype(jnp.int32), 0, n_bins - 1)
    # One fused scatter for [count, value] — scatters are the dominant cost
    # of the whole call on TPU, so halving them matters.
    cs = jnp.zeros((n_bins, 2), jnp.float32).at[idx].add(
        jnp.stack([jnp.ones_like(vs), vs], axis=-1))
    counts = cs[:, 0]
    sums = cs[:, 1]
    bin_centers = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), 0.0)
    bin_pos = vmin + (jnp.arange(n_bins, dtype=jnp.float32) + 0.5) / n_bins * span
    bin_val = jnp.where(counts > 0, bin_centers, bin_pos)

    def step(centers, _):
        d = jnp.abs(bin_val[:, None] - centers[None, :])
        assign = jnp.argmin(d, axis=1)
        one_hot = jax.nn.one_hot(assign, k, dtype=jnp.float32)
        w = one_hot * counts[:, None]
        new = (w * bin_val[:, None]).sum(0) / jnp.maximum(w.sum(0), 1e-12)
        new = jnp.where(w.sum(0) > 0, new, centers)
        return new, None

    def lloyd(init_centers):
        centers, _ = jax.lax.scan(step, init_centers, None, length=iters)
        d = jnp.abs(bin_val[:, None] - centers[None, :])
        inertia = jnp.sum(counts * jnp.min(d, axis=1) ** 2)
        return centers, inertia

    # Deterministic multi-start (the sklearn n_init analogue): quantile
    # spread handles balanced modes, value-range spread rescues the
    # tiny-bright-mode case (cells a small pixel fraction of the FOV), and a
    # max-anchored start guarantees a basin for a far-out bright mode.
    # Quantiles come from the histogram CDF (searchsorted over n_bins) — an
    # O(N) full sort would dominate the whole call on TPU.
    qs = (jnp.arange(k, dtype=jnp.float32) + 0.5) / k
    cdf = jnp.cumsum(counts)
    qbins = jnp.searchsorted(cdf, qs * cdf[-1])
    quant = bin_val[jnp.clip(qbins, 0, n_bins - 1)]
    inits = jnp.stack(
        [quant, vmin + qs * span, jnp.concatenate([quant[:-1], vmax[None]])]
    )
    all_centers, inertias = jax.vmap(lloyd)(inits)
    centers = all_centers[jnp.argmin(inertias)]
    return jnp.sort(centers)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def kmeans1d(values: jax.Array, k: int, iters: int = 40, n_bins: int = 2048):
    """Cluster scalar values into k groups with histogram-accelerated Lloyd.

    The N-point Lloyd update is collapsed onto a fixed n_bins histogram of the
    value range: O(n_bins * k) per iteration instead of O(N * k), with
    identical fixed points up to bin resolution. Returns (labels, centers)
    with centers sorted ascending so cluster k-1 is always the brightest.
    """
    centers = kmeans1d_centers(values, k, iters, n_bins)
    v = values.reshape(-1).astype(jnp.float32)
    labels = jnp.argmin(jnp.abs(v[:, None] - centers[None, :]), axis=1)
    return labels.reshape(values.shape).astype(jnp.int32), centers


def brightest_cluster_mask(image: jax.Array, k: int = 2, iters: int = 40):
    """Boolean mask of the cluster with the highest center.

    Mirrors the reference's "compare per-cluster mean intensity, keep the
    brighter one" idiom (spectral_image_measurement.py:75-84). Membership in
    the brightest cluster is exactly ``value >= midpoint of the two highest
    centers`` (1-D nearest-center), so the (N, k) argmin pass is skipped."""
    centers = kmeans1d_centers(image, k, iters)
    return image >= (centers[-1] + centers[-2]) / 2.0


def darkest_cluster_mask(image: jax.Array, k: int = 2, iters: int = 40):
    labels, centers = kmeans1d(image, k, iters)
    return labels == 0
