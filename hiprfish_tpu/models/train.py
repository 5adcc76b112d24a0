"""Classifier training entry points (L5) mirroring the reference's
``load_training_data*`` builder family (hiprfish_imaging_train_reference.py).

Each builder: glob measured reference spectra ``*_enc_<n>_avgint.csv``, fit
per-code mean+covariance, draw simulations (vectorized mvnormal over all
codes in one jitted program), apply the variant's augmentation (excitation
adjustment / violet derivative / negative-error classes / FRET mixing /
code-set restriction), fit the check heads + kNN reference matrix, and save
one .npz artifact under the reference's filename convention (with .npz for
.pkl).

Variant map (reference line numbers):
  train_simulate_normalized                      :57    plain, no checks
  train_simulate_normalized_umap_transformed     :80
  train_excitation_adjusted                      :1389  10-bit, 5 checks
  train_excitation_adjusted_violet_derivative    :1429  ecoli default (132-d)
  train_excitation_adjusted_biofilm_7b           :1472  7-bit + negatives
  train_fret_biofilm_7b                          :1887  FRET + scaler
  train_fret_biofilm_7b_limited                  :1966  + probe-design subset
  train_simulate_normalized_select               :2148  mix-table subset
  train_direct                                   :2235  measured rows, no sim
"""

from __future__ import annotations

import glob
import os
import re
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from hiprfish_tpu.config import (
    ChannelLayout,
    ClassifierConfig,
    SEVEN_BIT,
    TEN_BIT,
    convert_code_to_7b,
)
from hiprfish_tpu.models import simulate as sim
from hiprfish_tpu.models.artifacts import save_classifier
from hiprfish_tpu.models.classifier import train_classifier


# ---------------------------------------------------------------------------
# Reference spectra loading
# ---------------------------------------------------------------------------


def load_reference_stats(reference_folder: str, pattern: str = "*_avgint.csv"):
    """{enc: (mean (C,), cov (C, C))} from measured reference CSVs
    (train_reference.py:63-66)."""
    out = {}
    for f in sorted(glob.glob(os.path.join(reference_folder, pattern))):
        m = re.search(r"enc_([0-9]+)", os.path.basename(f))
        if not m:
            continue
        enc = int(m.group(1))
        rows = np.loadtxt(f, delimiter=",", ndmin=2)
        out[enc] = (rows.mean(axis=0), np.cov(rows.T))
    return out


def check_bits_for_codes(layout: ChannelLayout, code_strings: Sequence[str]):
    """(N, n_checks) ground-truth check bits: OR over each block's bit group
    (train_reference.py:1408-1412)."""
    bits = np.array([[int(b) for b in c.split("_")[0]] for c in code_strings])
    cols = []
    for group in layout.check_bit_groups:
        cols.append(bits[:, list(group)].max(axis=1))
    return np.stack(cols, axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# Vectorized simulation core
# ---------------------------------------------------------------------------


def _simulate_codes(key, stats: dict, spc: int, cov_scale: float = 1.0,
                    channel_slice=None):
    """Vectorized mvnormal simulation for every code: one batched
    Cholesky+GEMM over (n_codes, spc, C). Returns (codes, spectra (n, C))."""
    encs = sorted(stats)
    means = np.stack([stats[e][0] for e in encs]).astype(np.float32)
    covs = np.stack([stats[e][1] for e in encs]).astype(np.float32) * cov_scale
    c = means.shape[1]
    sqrts = sim.psd_sqrt(covs)

    @jax.jit
    def draw(k):
        z = jax.random.normal(k, (len(encs), spc, c), jnp.float32)
        return jnp.asarray(means)[:, None, :] + jnp.einsum(
            "ksc,kdc->ksd", z, jnp.asarray(sqrts)
        )

    draws = np.asarray(draw(key)).reshape(len(encs) * spc, c)
    if channel_slice is not None:
        draws = draws[:, channel_slice[0]:channel_slice[1]]
    code_per_row = np.repeat(np.asarray(encs), spc)
    return code_per_row, draws


def _excitation_adjust_np(key, spectra, blocks, low, high):
    adjusted = sim.excitation_adjust(
        key, jnp.asarray(spectra), blocks, low, high
    )
    return np.asarray(sim.row_max_normalize(adjusted))


# ---------------------------------------------------------------------------
# Builders
# ---------------------------------------------------------------------------


def train_simulate_normalized(reference_folder, spc, cfg=ClassifierConfig(),
                              seed=0, save=True):
    """Plain simulated-spectra classifier, no checks/augmentation
    (train_reference.py:57-78)."""
    layout = TEN_BIT
    stats = load_reference_stats(reference_folder)
    key = jax.random.PRNGKey(seed)
    encs, spectra = _simulate_codes(key, stats, spc)
    spectra = np.asarray(sim.row_max_normalize(jnp.asarray(spectra)))
    codes = [layout.code_str(e) for e in encs]
    checks = check_bits_for_codes(layout, codes)
    clf = train_classifier(key, layout, spectra, codes, checks, cfg)
    if save:
        save_classifier(
            os.path.join(reference_folder,
                         f"reference_simulate_{spc}_normalized.npz"), clf)
    return clf


def train_simulate_normalized_umap_transformed(reference_folder, spc,
                                               cfg=ClassifierConfig(),
                                               seed=0, save=True):
    """3x-covariance simulated classifier (train_reference.py:80-100)."""
    layout = TEN_BIT
    stats = load_reference_stats(reference_folder)
    key = jax.random.PRNGKey(seed)
    encs, spectra = _simulate_codes(key, stats, spc, cov_scale=3.0)
    spectra = np.asarray(sim.row_max_normalize(jnp.asarray(spectra)))
    codes = [layout.code_str(e) for e in encs]
    checks = check_bits_for_codes(layout, codes)
    clf = train_classifier(key, layout, spectra, codes, checks, cfg)
    if save:
        save_classifier(
            os.path.join(
                reference_folder,
                f"reference_simulate_{spc}_normalized_umap_transform.npz"), clf)
    return clf


def train_excitation_adjusted(reference_folder, spc, cfg=ClassifierConfig(),
                              seed=0, save=True):
    """Excitation-adjusted 10-bit classifier (train_reference.py:1389-1427)."""
    layout = TEN_BIT
    stats = load_reference_stats(reference_folder)
    key, k2 = jax.random.split(jax.random.PRNGKey(seed))
    encs, spectra = _simulate_codes(key, stats, spc)
    spectra = np.asarray(sim.row_max_normalize(jnp.asarray(spectra)))
    spectra = _excitation_adjust_np(
        k2, spectra, layout.blocks,
        cfg.excitation_adjust_low, cfg.excitation_adjust_high)
    codes = [layout.code_str(e) for e in encs]
    checks = check_bits_for_codes(layout, codes)[:, :5]
    clf = train_classifier(key, layout, spectra, codes, checks, cfg)
    if save:
        save_classifier(
            os.path.join(
                reference_folder,
                f"reference_simulate_{spc}_excitation_adjusted_normalized_"
                "umap_transform.npz"), clf)
    return clf


def train_excitation_adjusted_violet_derivative(
    reference_folder, spc, cfg=ClassifierConfig(), seed=0, save=True
):
    """The ecoli-mix default: excitation adjusted + violet derivative,
    132-d features with 6 check heads (train_reference.py:1429-1470)."""
    layout = TEN_BIT
    stats = load_reference_stats(reference_folder)
    key, k2 = jax.random.split(jax.random.PRNGKey(seed))
    encs, spectra = _simulate_codes(key, stats, spc)
    spectra = np.asarray(sim.row_max_normalize(jnp.asarray(spectra)))
    spectra = _excitation_adjust_np(
        k2, spectra, layout.blocks,
        cfg.excitation_adjust_low, cfg.excitation_adjust_high)
    spectra = np.asarray(sim.violet_derivative(jnp.asarray(spectra),
                                               layout.blocks[0]))
    codes = [layout.code_str(e) for e in encs]
    checks = check_bits_for_codes(layout, codes)  # 6 checks incl. violet
    clf = train_classifier(key, layout, spectra, codes, checks, cfg,
                           violet_derivative=True)
    if save:
        save_classifier(
            os.path.join(
                reference_folder,
                f"reference_simulate_{spc}_excitation_adjusted_normalized_"
                "violet_derivative_umap_transform.npz"), clf)
    return clf


def _biofilm_7b_sets(layout, stats, spc, key, cfg, error_floor=0.4):
    """Positive + negative (error-class) 7-bit training sets from 10-bit
    reference stats (train_reference.py:1472-1523)."""
    sel = {}
    for enc, ms in stats.items():
        code10 = TEN_BIT.code_str(enc)
        if code10[6] == "0" and code10[5] == "0" and code10[1] == "0":
            sel[enc] = ms
    k1, k2, k3 = jax.random.split(key, 3)
    encs, spectra = _simulate_codes(k1, sel, spc, channel_slice=(32, 95))
    spectra = np.asarray(sim.row_max_normalize(jnp.asarray(spectra)))
    pos = _excitation_adjust_np(
        k2, spectra, layout.blocks,
        cfg.excitation_adjust_low, cfg.excitation_adjust_high)
    codes = [convert_code_to_7b(TEN_BIT.code_str(e)) for e in encs]
    checks = check_bits_for_codes(layout, codes)
    neg = np.asarray(sim.dim_blocks(
        k3, jnp.asarray(spectra), layout.blocks,
        [error_floor] * len(layout.blocks)))
    neg_codes = [c + "_error" for c in codes]
    neg_checks = np.zeros_like(checks)
    return pos, codes, checks, neg, neg_codes, neg_checks


def train_excitation_adjusted_biofilm_7b(reference_folder, spc,
                                         cfg=ClassifierConfig(), seed=0,
                                         save=True):
    """7-bit biofilm classifier with negative error classes
    (train_reference.py:1472-1523)."""
    layout = SEVEN_BIT
    stats = load_reference_stats(reference_folder)
    key = jax.random.PRNGKey(seed)
    pos, codes, checks, neg, neg_codes, neg_checks = _biofilm_7b_sets(
        layout, stats, spc, key, cfg)
    clf = train_classifier(
        key, layout, pos, codes, checks, cfg,
        check_spectra=np.concatenate([pos, neg]),
        check_bits_full=np.concatenate([checks, neg_checks]),
    )
    if save:
        save_classifier(
            os.path.join(
                reference_folder,
                f"reference_simulate_{spc}_excitation_adjusted_normalized_"
                "umap_transform_biofilm_7b.npz"), clf)
    return clf


def train_fret_biofilm_7b(
    reference_folder,
    fret_folder=None,
    spc=2000,
    cfg=ClassifierConfig(),
    seed=0,
    save=True,
    code_subset: Sequence[str] | None = None,
    probe_design_filename: str | None = None,
    fluorophore_barcodes=(512, 128, 64, 32, 4, 2, 1),
):
    """FRET/reabsorption-simulated 7-bit classifier with scaler — the
    variant invoked by the reference's main()
    (train_reference.py:1966-2049). Single-fluorophore reference spectra come
    from `{reference_folder}/*enc_<b>_avgint.csv` for the 7 one-hot barcodes;
    the Förster matrix is drawn per sample with distance U(6, 10).
    code_subset / probe_design_filename restrict the trained codes (the
    "_limited" variant)."""
    layout = SEVEN_BIT
    stats = load_reference_stats(reference_folder)
    missing = [b for b in fluorophore_barcodes if b not in stats]
    if missing:
        raise FileNotFoundError(
            f"single-fluorophore reference spectra missing for enc {missing}")
    if probe_design_filename is not None:
        import pandas as pd

        probes = pd.read_csv(probe_design_filename, dtype={"code": str})
        code_subset = set(np.unique(probes.code.values))
    key = jax.random.PRNGKey(seed)
    kf, kd, kn, kt = jax.random.split(key, 4)

    n_bits = layout.n_bits
    c10 = stats[fluorophore_barcodes[0]][0].shape[0]
    means = np.stack([stats[b][0] for b in fluorophore_barcodes]).astype(np.float32)
    covs = np.stack([stats[b][1] for b in fluorophore_barcodes]).astype(np.float32)
    # 7-bit channels are the 10-bit range [32:95] (train_reference.py:2004)
    sl = slice(32, 95) if c10 == 95 else slice(0, layout.n_channels)
    chols = sim.psd_sqrt(covs)

    # Per-sample random Förster distance (train_reference.py:1982-1983).
    dists = 6.0 + 4.0 * np.asarray(jax.random.uniform(kf, (spc,)))
    fret = np.stack([sim.fret_transfer_matrix(float(d)) for d in dists])

    all_spectra, all_codes = [], []
    neg_spectra, neg_codes = [], []
    exc = sim.EXCITATION_MATRIX_7B
    indices = layout.block_bounds
    rng = np.random.RandomState(seed + 1)
    for enc in range(1, 2**n_bits):
        code = layout.code_str(enc)
        if code_subset is not None and code not in code_subset:
            continue
        bits = np.array([int(a) for a in code], np.float32)
        error_scale = [0.25, 0.25, 0.35, 0.45] if bits[6] else [0.1, 0.25, 0.35, 0.45]
        spectra = np.zeros((spc, layout.n_channels), np.float32)
        # Per-fluorophore draws reused across lasers for this code.
        z = rng.randn(n_bits, spc, c10).astype(np.float32)
        draws = means[:, None, :] + np.einsum("ksc,kdc->ksd", z, chols)
        draws7 = draws[:, :, sl]
        for e in range(exc.shape[0]):
            relevant = bits * exc[e]
            coeff = np.einsum("nij,j->ni", fret, relevant) * relevant
            mixed = np.einsum("ni,inc->nc", coeff, draws7)
            lo, hi = indices[e], indices[e + 1]
            spectra[:, lo:hi] = mixed[:, lo:hi]
        norm = spectra / np.maximum(spectra.max(axis=1, keepdims=True), 1e-12)
        # Excitation-adjust with an intensity floor (train_reference.py:2007-2012)
        adj = norm.copy()
        for b in range(4):
            lo, hi = indices[b], indices[b + 1]
            coefc = error_scale[b] + (1 - error_scale[b]) * rng.rand(spc)
            max_int = adj[:, lo:hi].max(axis=1)
            coefc = np.where(coefc * max_int < error_scale[b], 1.0, coefc)
            adj[:, lo:hi] *= coefc[:, None]
        adj = adj / np.maximum(adj.max(axis=1, keepdims=True), 1e-12)
        all_spectra.append(adj.astype(np.float32))
        all_codes.extend([code] * spc)
        # Negative class: blocks dimmed to U(0, error_scale)
        negs = norm.copy()
        for b in range(4):
            lo, hi = indices[b], indices[b + 1]
            negs[:, lo:hi] *= (error_scale[b] * rng.rand(spc))[:, None]
        neg_spectra.append(negs.astype(np.float32))
        neg_codes.extend([code + "_error"] * spc)

    pos = np.concatenate(all_spectra)
    neg = np.concatenate(neg_spectra)
    checks = check_bits_for_codes(layout, all_codes)
    neg_checks = np.zeros((neg.shape[0], checks.shape[1]), np.float32)
    clf = train_classifier(
        kt, layout, pos, all_codes, checks, cfg, scaler=True,
        check_spectra=np.concatenate([pos, neg]),
        check_bits_full=np.concatenate([checks, neg_checks]),
    )
    if save:
        tag = "" if code_subset is None else "DSGN_"
        save_classifier(
            os.path.join(
                reference_folder,
                f"reference_simulate_{spc}_{tag}interaction_simulated_"
                "excitation_adjusted_normalized_umap_transform_biofilm_7b.npz"),
            clf)
    return clf


def train_simulate_normalized_select(reference_folder, spc, input_tab_filename,
                                     cfg=ClassifierConfig(), seed=0, save=True):
    """Classifier restricted to the barcodes of a mix table
    (train_reference.py:2148-2172)."""
    import pandas as pd

    layout = TEN_BIT
    tab = pd.read_csv(input_tab_filename)
    wanted = set(int(b) for b in tab.Barcodes.values)
    stats = {e: ms for e, ms in load_reference_stats(
        reference_folder, "*_avgint_norm.csv").items() if e in wanted}
    key = jax.random.PRNGKey(seed)
    encs, spectra = _simulate_codes(key, stats, spc, cov_scale=3.0)
    spectra = np.asarray(sim.row_max_normalize(jnp.asarray(spectra)))
    codes = [layout.code_str(e) for e in encs]
    checks = check_bits_for_codes(layout, codes)
    clf = train_classifier(key, layout, spectra, codes, checks, cfg)
    if save:
        m = re.search(r"mix_([0-9]+)", input_tab_filename)
        mix_id = m.group(1) if m else "0"
        save_classifier(
            os.path.join(
                reference_folder,
                f"reference_simulate_select_mix_{mix_id}_{spc}_normalized_"
                "umap_transform.npz"), clf)
    return clf


def train_direct(reference_folder, cfg=ClassifierConfig(), seed=0, save=True):
    """Classifier on the measured reference rows themselves, no simulation
    (load_training_data, train_reference.py:2235-2251)."""
    layout = TEN_BIT
    rows_all, codes = [], []
    for f in sorted(glob.glob(os.path.join(reference_folder, "*_avgint.csv"))):
        m = re.search(r"enc_([0-9]+)", os.path.basename(f))
        if not m:
            continue
        rows = np.loadtxt(f, delimiter=",", ndmin=2)
        rows = rows / np.maximum(rows.max(axis=1, keepdims=True), 1e-12)
        rows_all.append(rows.astype(np.float32))
        codes.extend([layout.code_str(int(m.group(1)))] * rows.shape[0])
    spectra = np.concatenate(rows_all)
    checks = check_bits_for_codes(layout, codes)
    clf = train_classifier(jax.random.PRNGKey(seed), layout, spectra, codes,
                           checks, cfg)
    if save:
        save_classifier(os.path.join(reference_folder, "reference_all.npz"), clf)
    return clf
