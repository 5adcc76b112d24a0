"""Reference-style classifier stack for parity testing.

Training transcribes the reference's simulate-excitation-adjusted builders:

* 7-bit:  load_training_data_simulate_excitation_adjusted_normalized_
          umap_transformed_biofilm_7b (train_reference.py:1472-1523)
* 10-bit: load_training_data_simulate_excitation_adjusted_normalized_
          violet_derivative_umap_transformed (train_reference.py:1429-1470)

with the same sklearn ``svm.SVC(C=10, gamma=0.5)`` check heads. The one
non-installable piece, ``umap.UMAP(n_neighbors=25, metric=...)`` transform +
embedding SVC, is replaced by exact k-NN (k=25) majority vote under a numpy
transcription of the same gated block-cosine metrics
(channel_cosine_intensity_7b_v2, train_reference.py:993-1072;
channel_cosine_intensity_violet_derivative_v2, :568-731 — the latter's
*intended* scalar semantics: the committed code returns a tuple and cannot
actually run under UMAP, another latent defect alongside SURVEY.md §2.4).

Both builders follow the reference's on-disk contract exactly: 95-channel
``*_avgint.csv`` reference measurements named by 10-bit encodings; the 7-bit
builder filters to subset-compatible codes and slices channels 32:95
(train_reference.py:1483-1486).
"""

from __future__ import annotations

import glob
import os
import re

import numpy as np
import pandas as pd
from sklearn import svm


# ---------------------------------------------------------------------------
# Gated block-cosine metrics, vectorized to distance matrices
# ---------------------------------------------------------------------------


def _block_cosine_dist(q: np.ndarray, r: np.ndarray) -> np.ndarray:
    """(N, M) cosine distance of one block with the reference's zero-norm
    special cases: both zero -> 0, one zero -> 1."""
    qn = np.sqrt((q**2).sum(1))
    rn = np.sqrt((r**2).sum(1))
    dot = q @ r.T
    with np.errstate(invalid="ignore", divide="ignore"):
        d = 1.0 - dot / (qn[:, None] * rn[None, :])
    both_zero = (qn[:, None] == 0) & (rn[None, :] == 0)
    one_zero = (qn[:, None] == 0) ^ (rn[None, :] == 0)
    d = np.where(both_zero, 0.0, d)
    d = np.where(one_zero, 1.0, d)
    return np.nan_to_num(d)


def metric_matrix(q: np.ndarray, r: np.ndarray, blocks, check_slice,
                  scale: float) -> np.ndarray:
    """(N, M) gated metric: per-block cosine distances (a block contributes 0
    when the query's corresponding check bit is 0), averaged over blocks and
    scaled; pairs whose check bits differ (sum |dx| >= 0.01) get distance 1.
    ``blocks[i]`` is gated by check bit i = column check_slice[0]+i."""
    q = np.asarray(q, np.float64)
    r = np.asarray(r, np.float64)
    lo, hi = check_slice
    gate_diff = np.abs(q[:, lo:hi, None] - r[:, lo:hi].T[None, :, :]).sum(1)
    same = gate_diff < 0.01
    total = np.zeros((q.shape[0], r.shape[0]))
    for b, (blo, bhi) in enumerate(blocks):
        d = _block_cosine_dist(q[:, blo:bhi], r[:, blo:bhi])
        if lo + b < hi:
            d = d * (q[:, lo + b:lo + b + 1] != 0)
        total += d
    total = scale * total / len(blocks)
    return np.where(same, total, 1.0)


def metric_7b_scalar(x: np.ndarray, y: np.ndarray) -> float:
    """Literal scalar transcription of channel_cosine_intensity_7b_v2
    (train_reference.py:993-1072) for spot-checking the vectorized matrix."""
    if np.sum(np.abs(x[63:67] - y[63:67])) >= 0.01:
        return 1.0
    dists = []
    for b, (lo, hi) in enumerate(((0, 23), (23, 43), (43, 57), (57, 63))):
        if x[63 + b] == 0:
            dists.append(0.0)
            continue
        nx = float(np.sum(x[lo:hi] ** 2))
        ny = float(np.sum(y[lo:hi] ** 2))
        dot = float(np.sum(x[lo:hi] * y[lo:hi]))
        if nx == 0.0 and ny == 0.0:
            dists.append(0.0)
        elif nx == 0.0 or ny == 0.0:
            dists.append(1.0)
        else:
            dists.append(1.0 - dot / np.sqrt(nx * ny))
    return 0.5 * sum(dists) / 4


BLOCKS_7B = ((0, 23), (23, 43), (43, 57), (57, 63))
CHECKS_7B = (63, 67)
# 10-bit: 5 laser blocks + the violet-derivative block, gated on cols 126:132.
BLOCKS_10B = ((0, 32), (32, 55), (55, 75), (75, 89), (89, 95), (95, 126))
CHECKS_10B = (126, 132)


# ---------------------------------------------------------------------------
# Reference training recipes
# ---------------------------------------------------------------------------


def _read_reference_stats(reference_folder: str):
    """{code_string(enc): (mean, cov)} from *_avgint.csv files
    (train_reference.py:1479-1486)."""
    stats = {}
    for f in sorted(glob.glob(os.path.join(reference_folder, "*_avgint.csv"))):
        enc = int(re.search("enc_([0-9]*)", os.path.basename(f)).group(1))
        tab = pd.read_csv(f, header=None)
        stats[enc] = (np.average(tab, axis=0), np.cov(tab.values.T))
    return stats


def _check_bits(code: str, groups) -> list:
    return [int(any(code[i] == "1" for i in g)) for g in groups]


class RefKnnClassifier:
    """Check SVCs + exact metric-kNN barcode caller."""

    def __init__(self, blocks, check_slice, scale, check_blocks,
                 violet_derivative=False):
        self.blocks = blocks
        self.check_slice = check_slice
        self.scale = scale
        self.check_blocks = check_blocks
        self.violet_derivative = violet_derivative
        self.svcs = []
        self.train_features = None
        self.train_codes = None

    def fit(self, pos_features, pos_codes, full_features, full_checks,
            rng=None):
        self.train_features = np.asarray(pos_features, np.float64)
        self.train_codes = np.asarray(pos_codes)
        self.svcs = []
        for b, (lo, hi) in enumerate(self.check_blocks):
            clf = svm.SVC(C=10, gamma=0.5)
            clf.fit(full_features[:, lo:hi], full_checks[:, b])
            self.svcs.append(clf)

    def build_features(self, avgint_norm: np.ndarray) -> np.ndarray:
        x = np.asarray(avgint_norm, np.float64)
        if self.violet_derivative:
            # image_classification.py:47-54 feature build.
            x = np.concatenate([x, np.diff(x[:, 0:32], axis=1)], axis=1)
        checks = np.column_stack([
            clf.predict(x[:, lo:hi])
            for clf, (lo, hi) in zip(self.svcs, self.check_blocks)
        ])
        return np.concatenate([x, checks], axis=1)

    def predict(self, avgint_norm: np.ndarray, k: int = 25) -> np.ndarray:
        feats = self.build_features(avgint_norm)
        d = metric_matrix(feats, self.train_features, self.blocks,
                          self.check_slice, self.scale)
        idx = np.argpartition(d, kth=min(k, d.shape[1] - 1), axis=1)[:, :k]
        out = []
        for i in range(feats.shape[0]):
            codes, counts = np.unique(self.train_codes[idx[i]],
                                      return_counts=True)
            out.append(codes[np.argmax(counts)])
        return np.asarray(out)


def train_ref_7b(reference_folder: str, spc: int, seed: int = 0
                 ) -> RefKnnClassifier:
    """train_reference.py:1472-1523: read 95-channel reference CSVs named by
    10-bit encodings, keep codes compatible with the 7-bit subset (string
    positions 1/5/6 zero, :1483), slice channels 32:95 (:1486), simulate +
    excitation-adjust + negative error classes. Class labels use the 7-bit
    projection of the code (the reference stores the full 10-bit string —
    a fixed bijection for these codes)."""
    from hiprfish_tpu.config import SEVEN_BIT, convert_code_to_7b

    rng = np.random.RandomState(seed)
    stats = _read_reference_stats(reference_folder)
    pos_rows, pos_codes, neg_rows = [], [], []
    for enc, (mean, cov) in stats.items():
        code10 = format(enc, "010b")
        if not (code10[6] == "0" and code10[5] == "0" and code10[1] == "0"):
            continue
        code = convert_code_to_7b(code10)
        sim = rng.multivariate_normal(mean, cov, spc)[:, 32:95]
        sim_norm = sim / np.max(sim, axis=1)[:, None]
        for lo, hi in BLOCKS_7B:
            sim_norm[:, lo:hi] = \
                (0.4 + 0.6 * rng.random_sample(spc))[:, None] * \
                sim_norm[:, lo:hi]
        adj = sim_norm / np.max(sim_norm, axis=1)[:, None]
        checks = _check_bits(code, SEVEN_BIT.check_bit_groups)
        pos_rows.append(np.concatenate(
            [adj, np.tile(checks, (spc, 1))], axis=1))
        pos_codes += [code] * spc
        # Negative/error class: per-block 0.4*rand dim, checks all 0
        # (train_reference.py:1499-1510).
        neg = sim / np.max(sim, axis=1)[:, None]
        for lo, hi in BLOCKS_7B:
            neg[:, lo:hi] = (0.4 * rng.random_sample(spc))[:, None] * \
                neg[:, lo:hi]
        neg_rows.append(np.concatenate([neg, np.zeros((spc, 4))], axis=1))
    pos = np.concatenate(pos_rows)
    full = np.concatenate([pos, np.concatenate(neg_rows)])
    clf = RefKnnClassifier(BLOCKS_7B, CHECKS_7B, 0.5, BLOCKS_7B)
    clf.fit(pos, np.asarray(pos_codes), full[:, :63],
            full[:, 63:67])
    return clf


def train_ref_10b(reference_folder: str, spc: int, seed: int = 0
                  ) -> RefKnnClassifier:
    """train_reference.py:1429-1470 (no negative class; 6 check heads, the
    6th on the violet-derivative slice 95:126)."""
    from hiprfish_tpu.config import TEN_BIT

    rng = np.random.RandomState(seed)
    stats = _read_reference_stats(reference_folder)
    rows, codes_out = [], []
    for enc, (mean, cov) in stats.items():
        code = format(enc, "010b")
        sim = rng.multivariate_normal(mean, cov, spc)
        sim_norm = sim / np.max(sim, axis=1)[:, None]
        for lo, hi in ((0, 32), (32, 55), (55, 75), (75, 89), (89, 95)):
            sim_norm[:, lo:hi] = \
                (0.4 + 0.6 * rng.random_sample(spc))[:, None] * \
                sim_norm[:, lo:hi]
        adj = sim_norm / np.max(sim_norm, axis=1)[:, None]
        deriv = np.diff(adj[:, 0:32], axis=1)
        checks = _check_bits(code, TEN_BIT.check_bit_groups)
        rows.append(np.concatenate(
            [adj, deriv, np.tile(checks, (spc, 1))], axis=1))
        codes_out += [code] * spc
    full = np.concatenate(rows)
    check_blocks = ((0, 32), (32, 55), (55, 75), (75, 89), (89, 95),
                    (95, 126))
    clf = RefKnnClassifier(BLOCKS_10B, CHECKS_10B, 1.0, check_blocks,
                           violet_derivative=True)
    clf.fit(full, np.asarray(codes_out), full[:, :126], full[:, 126:132])
    return clf
