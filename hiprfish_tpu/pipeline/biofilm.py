"""Biofilm 2D analysis (L2-L4+L6): segmentation with adjacency watershed +
epithelial-region detection, per-cell measurement + probabilistic 7-bit
classification, debris filtering, taxon identification imagery, and the
spatial adjacency matrix.

Mirrors hiprfish_imaging_biofilm_analysis.py:322-419 (segmentation),
:1208-1296 (measure_biofilm_images_2d), :1298-1357 (z-slice variant):
artifact set {sample}_registered.npy, _seg.npy, _adjacency_seg.npy,
_epithelial_area.npy, _avgint.csv, _cell_information(.csv/_filtered.csv),
_avgint_filtered.csv, _identification(.png), _identification_filtered.npy,
_adjacency_matrix(.csv/_filtered.csv).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import jax.numpy as jnp

from hiprfish_tpu.config import SegmentationConfig
from hiprfish_tpu.io import outputs
from hiprfish_tpu.models.classifier import SpectralClassifier
from hiprfish_tpu.ops import regionprops as rp
from hiprfish_tpu.pipeline import measure, segment2d


def make_taxon_lookup(probes: pd.DataFrame, sci_names: dict | None = None
                      ) -> pd.DataFrame:
    """Taxon -> (code, HSV color) lookup from a probe-design table with
    evenly spaced hues (biofilm_analysis.py:1428-1437). ``sci_names``
    optionally maps taxid -> scientific name (replaces the ete3 NCBITaxa
    lookup, which needs a local taxonomy database)."""
    lookup = probes.loc[:, ["target_taxon", "code"]].drop_duplicates()
    lookup = lookup.reset_index(drop=True)
    lookup["H"] = np.arange(lookup.shape[0]) / max(lookup.shape[0], 1)
    lookup["S"] = 1.0
    lookup["V"] = 1.0
    if sci_names:
        lookup["sci_name"] = [
            sci_names.get(int(t), str(t)) for t in lookup.target_taxon
        ]
    return lookup


def adjacency_label_pairs(adjacency_seg: np.ndarray) -> np.ndarray:
    """Unique undirected pairs of touching region labels (both nonzero) —
    the edge set of skimage.future.graph.rag_boundary over the adjacency
    segmentation (biofilm_analysis.py:1277-1278), computed from the two
    pixel-neighbor relations instead of a graph build."""
    seg = np.asarray(adjacency_seg)
    pairs = []
    for a, b in ((seg[:-1, :], seg[1:, :]), (seg[:, :-1], seg[:, 1:])):
        mask = (a != b) & (a > 0) & (b > 0)
        pairs.append(np.stack([a[mask], b[mask]], axis=1))
    pairs = np.concatenate(pairs)
    if pairs.size == 0:
        return np.zeros((0, 2), np.int64)
    lo = pairs.min(axis=1)
    hi = pairs.max(axis=1)
    return np.unique(np.stack([lo, hi], axis=1), axis=0)


def adjacency_matrix_from_pairs(pairs, cell_codes, taxon_lookup,
                                cell_types=None):
    """Barcode x barcode contact-count matrices (full + debris-filtered),
    matching the RAG edge tally of biofilm_analysis.py:1279-1291 (each
    undirected edge increments both directions)."""
    codes = list(taxon_lookup.code.values)
    n = len(codes)
    idx = {c: i for i, c in enumerate(codes)}
    mat = np.zeros((n, n))
    mat_f = np.zeros((n, n))
    n_cells = len(cell_codes)
    for u, v in pairs:
        if u - 1 >= n_cells or v - 1 >= n_cells:
            continue
        cu = str(cell_codes[u - 1]).split("_")[0]
        cv = str(cell_codes[v - 1]).split("_")[0]
        if cu not in idx or cv not in idx:
            continue
        mat[idx[cu], idx[cv]] += 1
        mat[idx[cv], idx[cu]] += 1
        if cell_types is not None and (
            cell_types[u - 1] == "cell" and cell_types[v - 1] == "cell"
        ):
            mat_f[idx[cu], idx[cv]] += 1
            mat_f[idx[cv], idx[cu]] += 1
    mk = lambda m: pd.DataFrame(m, index=codes, columns=codes)
    return mk(mat), mk(mat_f)


def paint_taxon_identification(segmentation, cell_codes, taxon_lookup,
                               n_cells: int):
    """(H, W, 3) RGB identification image: known codes get their taxon HSV
    hue, unknown codes white (biofilm_analysis.py:1247-1257)."""
    from matplotlib.colors import hsv_to_rgb

    code_to_rgb = {
        str(row.code): hsv_to_rgb([row.H, row.S, row.V])
        for row in taxon_lookup.itertuples()
    }
    lut = np.zeros((n_cells + 1, 3), np.float32)
    for i, c in enumerate(cell_codes):
        lut[i + 1] = code_to_rgb.get(str(c).split("_")[0], (1.0, 1.0, 1.0))
    seg = np.clip(np.asarray(segmentation), 0, n_cells)
    return lut[seg]


def measure_epithelial_distance(cx, cy, boundary_coords):
    """Min distance from a centroid to the epithelial boundary
    (biofilm_analysis.py:1202-1206)."""
    d = np.sqrt((boundary_coords[:, 0] - cx) ** 2
                + (boundary_coords[:, 1] - cy) ** 2)
    return float(d.min()) if d.size else 0.0


def measure_biofilm_images_2d(sample: str, clf: SpectralClassifier,
                              taxon_lookup: pd.DataFrame,
                              image_stack=None,
                              cfg: SegmentationConfig = SegmentationConfig(),
                              max_cells: int = 4096,
                              save_png: bool = True,
                              pixel_um: float = None) -> pd.DataFrame:
    """Full biofilm 2D FOV analysis; returns the cell_information table.

    If ``image_stack`` is None the per-laser files '{sample}_<laser>.czi/npy'
    are loaded. ``pixel_um`` sets the identification figures' scale bar;
    when None it is read from the CZI Scaling metadata if the inputs are
    CZIs, falling back to the reference's hard-coded 0.0675 µm
    (biofilm_analysis.py:245,260).
    """
    from hiprfish_tpu.config import SEVEN_BIT
    from hiprfish_tpu.io import images as iio

    if image_stack is None:
        import glob as _glob

        image_stack = []
        for laser in SEVEN_BIT.lasers:
            hits = _glob.glob(f"{sample}_{laser}.*")
            if not hits:
                raise FileNotFoundError(f"{sample}_{laser}.(czi|npy)")
            image_stack.append(iio.load_image(hits[0]))
            if pixel_um is None and hits[0].endswith(".czi"):
                from hiprfish_tpu.io import czi as _czi

                try:
                    with _czi.CziFile(hits[0]) as cf:
                        pixel_um = cf.pixel_size_um
                except (ValueError, OSError, AttributeError):
                    pixel_um = None
    if pixel_um is None:
        pixel_um = 0.0675

    res = segment2d.segment_lpcv(image_stack, None, cfg, max_cells, "biofilm")
    n = int(res.n_cells)
    seg = np.asarray(res.segmentation)
    np.save(f"{sample}_registered.npy", np.asarray(res.registered))
    np.save(f"{sample}_seg.npy", seg)
    np.save(f"{sample}_adjacency_seg.npy", np.asarray(res.adjacency))
    np.save(f"{sample}_epithelial_area.npy", np.asarray(res.epithelial))

    avgint, avgint_norm = measure.measure_fov(
        res.segmentation, res.registered, n, max_cells)
    pd.DataFrame(avgint).to_csv(f"{sample}_avgint.csv", index=None)

    codes, max_prob, probs, feats = clf.classify(jnp.asarray(avgint_norm))

    props = {k: np.asarray(v)[1: n + 1]
             for k, v in rp.shape_props_2d(res.segmentation, max_cells).items()}
    nch = clf.n_channels
    cell_info = pd.DataFrame(
        np.asarray(feats),
        columns=[f"channel_{i}" for i in range(nch)]
        + [f"intensity_classification_{i}" for i in range(feats.shape[1] - nch)],
    )
    cell_info["cell_barcode"] = codes
    cell_info["max_probability"] = max_prob
    for ci, cname in enumerate(clf.codebook):
        cell_info[f"{cname}_prob"] = probs[:, ci]
    cell_info["sample"] = sample
    cell_info["label"] = np.arange(1, n + 1)
    cell_info["centroid_x"] = props["centroid_r"]
    cell_info["centroid_y"] = props["centroid_c"]
    cell_info["major_axis"] = props["major_axis_length"]
    cell_info["minor_axis"] = props["minor_axis_length"]
    cell_info["eccentricity"] = props["eccentricity"]
    cell_info["orientation"] = props["orientation"]
    cell_info["area"] = props["area"]
    cell_info["epithelial_distance"] = 0.0
    cell_info["max_intensity"] = np.asarray(feats)[:, :nch].max(axis=1)
    cell_info["type"] = "cell"

    # Debris filter (biofilm_analysis.py:1263-1269): oversized, overlapping
    # the epithelial area, or low classification confidence.
    epi_overlap = np.asarray(rp.label_overlap_any(
        res.segmentation, res.epithelial, max_cells))[1: n + 1]
    debris = (
        (cell_info.area.values > cfg.debris_area_max)
        | epi_overlap
        | (cell_info.max_probability.values <= cfg.debris_prob_min)
    )
    cell_info.loc[debris, "type"] = "debris"
    cell_info.to_csv(f"{sample}_cell_information.csv", index=None)
    cell_info[cell_info.type == "cell"].to_csv(
        f"{sample}_cell_information_filtered.csv", index=None)
    pd.DataFrame(avgint[cell_info.type.values == "cell"]).to_csv(
        f"{sample}_avgint_filtered.csv", index=None)

    # Identification imagery.
    ident = paint_taxon_identification(seg, codes, taxon_lookup, n)
    ident_filtered = ident.copy()
    debris_mask = debris[np.clip(seg, 1, max(n, 1)) - 1] & (seg > 0)
    ident_filtered[debris_mask] = [0.5, 0.5, 0.5]
    ident_filtered[np.asarray(res.epithelial) & (seg > 0)] = [0.5, 0.5, 0.5]
    np.save(f"{sample}_identification_filtered.npy", ident_filtered)
    if save_png:
        outputs._save_image_png(ident, f"{sample}_identification.png",
                                pixel_um=pixel_um, framed=True)
        outputs._save_image_png(ident_filtered,
                                f"{sample}_identification_filtered.png",
                                pixel_um=pixel_um, framed=True)

    # Spatial adjacency matrices over the adjacency segmentation.
    pairs = adjacency_label_pairs(np.asarray(res.adjacency))
    mat, mat_f = adjacency_matrix_from_pairs(
        pairs, codes, taxon_lookup, cell_info.type.values)
    mat.to_csv(f"{sample}_adjacency_matrix.csv")
    mat_f.to_csv(f"{sample}_adjacency_matrix_filtered.csv")
    return cell_info
