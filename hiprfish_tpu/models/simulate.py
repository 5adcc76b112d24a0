"""Spectral training-set simulation on device (jax.random).

Reproduces the reference's simulator families
(hiprfish_imaging_train_reference.py:57-2251): multivariate-normal draws
around measured per-barcode reference spectra, per-laser-block random
excitation adjustment, violet-derivative features, negative/"error" classes
with dimmed blocks, and FRET/reabsorption physics mixing single-fluorophore
spectra through a Förster transfer matrix.

All samplers are vectorized over (codes x simulations) in one jitted program;
per-code mvnormal draws batch through a single Cholesky-matmul.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp



# ---------------------------------------------------------------------------
# Core samplers
# ---------------------------------------------------------------------------


def psd_sqrt(cov: np.ndarray) -> np.ndarray:
    """Symmetric square root of a (possibly rank-deficient) covariance via
    eigendecomposition with eigenvalue clipping — measured reference
    covariances are singular whenever cells-per-code < channels, which
    np.random.multivariate_normal tolerates but Cholesky does not.
    Supports batched (..., C, C)."""
    cov = np.asarray(cov, np.float64)
    cov = (cov + np.swapaxes(cov, -1, -2)) / 2.0
    w, v = np.linalg.eigh(cov)
    w = np.clip(w, 0.0, None)
    return (v * np.sqrt(w)[..., None, :]).astype(np.float32)


def mvnormal(key, mean: jax.Array, cov, n: int) -> jax.Array:
    """(n, C) multivariate-normal draws via the PSD square root."""
    c = mean.shape[-1]
    sqrt = jnp.asarray(psd_sqrt(np.asarray(cov)))
    z = jax.random.normal(key, (n, c), dtype=jnp.float32)
    return mean[None, :] + z @ sqrt.T


def row_max_normalize(x: jax.Array) -> jax.Array:
    return x / jnp.maximum(jnp.max(x, axis=-1, keepdims=True), 1e-12)


def excitation_adjust(key, spectra: jax.Array, blocks, low: float, high: float):
    """Random per-laser-block brightness scaling — the key robustness trick
    (train_reference.py:1402-1404): each block scaled by U(low, high) per
    sample."""
    out = spectra
    keys = jax.random.split(key, len(blocks))
    for k, (lo, hi) in zip(keys, blocks):
        scale = low + (high - low) * jax.random.uniform(k, (spectra.shape[0], 1))
        out = out.at[:, lo:hi].multiply(scale)
    return out


def dim_blocks(key, spectra: jax.Array, blocks, scales: Sequence[float]):
    """Negative/'error' class simulation: block b scaled by U(0, scales[b])
    (train_reference.py:1499-1510, 2021-2032)."""
    out = spectra
    keys = jax.random.split(key, len(blocks))
    for k, (lo, hi), s in zip(keys, blocks, scales):
        scale = s * jax.random.uniform(k, (spectra.shape[0], 1))
        out = out.at[:, lo:hi].multiply(scale)
    return out


def violet_derivative(spectra: jax.Array, block=(0, 32)) -> jax.Array:
    """Append np.diff of the violet block (train_reference.py:1445-1446)."""
    lo, hi = block
    return jnp.concatenate(
        [spectra, jnp.diff(spectra[:, lo:hi], axis=1)], axis=1
    )


# ---------------------------------------------------------------------------
# FRET / reabsorption physics
# ---------------------------------------------------------------------------

# Per-fluorophore photophysics constants (train_reference.py:1733-1735).
MOLAR_EXTINCTION = (73000.0, 112000.0, 120000.0, 144000.0, 270000.0, 50000.0, 81000.0)
QUANTUM_YIELD = (0.92, 0.79, 1.0, 0.33, 0.33, 1.0, 0.61)

# Which fluorophores each of the 4 lasers excites
# (train_reference.py:1901-1904).
EXCITATION_MATRIX_7B = np.array(
    [
        [1, 1, 0, 0, 1, 1, 1],
        [1, 1, 0, 0, 1, 1, 1],
        [0, 1, 1, 1, 1, 1, 0],
        [0, 0, 1, 1, 0, 0, 0],
    ],
    np.float32,
)


def default_fluorophore_curves(n: int = 7, n_wl: int = 401,
                               wl_lo: float = 400.0, wl_hi: float = 800.0):
    """Synthetic excitation/emission curves standing in for the reference's
    R*_excitation.csv measurement files (train_reference.py:1739-1740):
    Gaussian excitation and Stokes-shifted emission, peaks spread across the
    visible range in descending-wavelength fluorophore order."""
    wl = np.linspace(wl_lo, wl_hi, n_wl)
    exc = np.zeros((n, n_wl))
    emi = np.zeros((n, n_wl))
    peaks = np.linspace(wl_hi - 120, wl_lo + 40, n)  # descending, like R10..R1
    for i, p in enumerate(peaks):
        exc[i] = np.exp(-((wl - p) ** 2) / (2 * 25.0**2))
        emi[i] = np.exp(-((wl - (p + 30.0)) ** 2) / (2 * 30.0**2))
    return wl, exc, emi


def fret_transfer_matrix(
    distance: float,
    wavelengths: np.ndarray | None = None,
    excitation: np.ndarray | None = None,
    emission: np.ndarray | None = None,
    kappa_squared: float = 2.0 / 3.0,
    refractive_index: float = 1.4,
) -> np.ndarray:
    """7x7 signed Förster transfer matrix (calculate_fret_efficiency,
    train_reference.py:1723-1754): J-overlap integral of donor emission with
    acceptor excitation, R0^6 law, transfer sign by emission ordering."""
    if wavelengths is None:
        wavelengths, excitation, emission = default_fluorophore_curves()
    n = excitation.shape[0]
    avogadro = 6.022e23
    prefactor = (
        2.07 * kappa_squared * 1.0
        / (128 * np.pi**5 * refractive_index**4 * avogadro)
        * 1e17
    )
    out = np.eye(n)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            em_max_i = wavelengths[np.argmax(emission[i])]
            em_max_j = wavelengths[np.argmax(emission[j])]
            if em_max_i < em_max_j:
                donor, acceptor = i, j
            else:
                donor, acceptor = j, i
            d_em = emission[donor] / max(emission[donor].sum(), 1e-30)
            a_ex = np.clip(excitation[acceptor] / max(excitation[acceptor].max(), 1e-30), 0, 1)
            j_overlap = float(np.sum(d_em * a_ex * wavelengths**4))
            r0 = (
                prefactor
                * j_overlap
                * MOLAR_EXTINCTION[acceptor]
                * QUANTUM_YIELD[donor]
            ) ** (1.0 / 6.0)
            eff = 1.0 / (1.0 + (distance / max(r0, 1e-9)) ** 6)
            out[i, j] = np.sign(em_max_i - em_max_j) * eff
    return out


def simulate_fret_code_spectra(
    key,
    code_bits: jax.Array,          # (n_bits,) 0/1
    fluor_means: jax.Array,        # (n_bits, C) single-fluorophore spectra means
    fluor_chols: jax.Array,        # (n_bits, C, C) cholesky of covariances
    fret_matrices: jax.Array,      # (n_sim, n_bits, n_bits)
    excitation_matrix: jax.Array,  # (n_lasers, n_bits)
    blocks,
    n_sim: int,
):
    """FRET-coupled spectra for one barcode (train_reference.py:1989-2013):
    per laser, the excited fluorophore set mixes through the per-sample FRET
    matrix; each laser's block of the spectrum comes from its own mix."""
    n_bits, c = fluor_means.shape
    keys = jax.random.split(key, n_bits)
    # (n_bits, n_sim, C) independent draws per fluorophore
    z = jnp.stack(
        [jax.random.normal(k, (n_sim, c), jnp.float32) for k in keys]
    )
    draws = fluor_means[:, None, :] + jnp.einsum("knc,kdc->knd", z, fluor_chols)
    spectra = jnp.zeros((n_sim, c), jnp.float32)
    for exc in range(excitation_matrix.shape[0]):
        relevant = code_bits * excitation_matrix[exc]
        coeff = jnp.einsum("nij,j->ni", fret_matrices, relevant) * relevant
        mixed = jnp.einsum("ni,inc->nc", coeff, draws)
        lo, hi = blocks[exc]
        spectra = spectra.at[:, lo:hi].set(mixed[:, lo:hi])
    return spectra
