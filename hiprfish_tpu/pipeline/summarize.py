"""L6: experiment summary statistics and figures.

Covers the reference's three summary scripts:
  * mix abundance plots (hiprfish_summarize_mix_experiment.py): mean barcode
    abundance vs the uniform 1/1023 expectation + abundance distribution;
  * titration correlation (hiprfish_summarize_titration_experiment.py):
    input-vs-measured abundance regression with gross-error rate at
    concentration 0, incl. the bootstrap mean estimate the reference left
    broken (:24-28 calls an undefined ``bootstrap``);
  * multispecies error-rate / Hamming-distance summary per taxon+encoding
    set (hiprfish_imaging_analyze_multispecies_images.py:34-121).
"""

from __future__ import annotations

import glob
import os
import re

import numpy as np
import pandas as pd


def hamming(s1: str, s2: str) -> int:
    assert len(s1) == len(s2)
    return sum(a != b for a, b in zip(s1, s2))


def bootstrap_estimate_mean(values, n_boot: int = 1000, seed: int = 0):
    """Bootstrap mean +- std (the estimator the reference's titration script
    intended, hiprfish_summarize_titration_experiment.py:24-28)."""
    rng = np.random.RandomState(seed)
    values = np.asarray(values, float)
    means = np.array(
        [rng.choice(values, values.size, replace=True).mean() for _ in range(n_boot)]
    )
    return means.mean(), means.std()


def mean_abundance(abundance_csv: str) -> pd.DataFrame:
    """Per-barcode mean relative abundance across FOV columns
    (summarize_mix_experiment.py:23-44)."""
    tab = pd.read_csv(abundance_csv)
    fov_cols = [c for c in tab.columns if c.startswith("FOV")]
    counts = tab[fov_cols].values
    totals = counts.sum(axis=0, keepdims=True)
    rel = counts / np.maximum(totals, 1)
    out = tab[["Barcodes"]].copy()
    out["MeanAbundance"] = rel.mean(axis=1)
    out["StdAbundance"] = rel.std(axis=1)
    return out


def plot_mean_abundance_barcodes(abundance_csv: str, output_pdf: str,
                                 n_barcodes: int = 1023) -> None:
    """Barcode vs mean abundance with the uniform 1/n expectation line
    (summarize_mix_experiment.py:23-44)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    tab = mean_abundance(abundance_csv)
    fig, ax = plt.subplots(figsize=(6, 3))
    ax.plot(tab.Barcodes, tab.MeanAbundance, "o", markersize=2, alpha=0.7)
    ax.axhline(1 / n_barcodes, color="orangered", lw=1,
               label=f"uniform 1/{n_barcodes}")
    ax.set_xlabel("Barcode")
    ax.set_ylabel("Mean abundance")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(output_pdf, dpi=300)
    plt.close(fig)


def plot_mean_abundance_distribution(abundance_csv: str, output_pdf: str,
                                     n_barcodes: int = 1023) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    tab = mean_abundance(abundance_csv)
    fig, ax = plt.subplots(figsize=(4, 3))
    ax.hist(tab.MeanAbundance, bins=50)
    ax.axvline(1 / n_barcodes, color="orangered", lw=1)
    ax.set_xlabel("Mean abundance")
    ax.set_ylabel("Barcodes")
    fig.tight_layout()
    fig.savefig(output_pdf, dpi=300)
    plt.close(fig)


def plot_avg_int_reference(avgint: "np.ndarray", enc: int, output_pdf: str,
                           n_bits: int = 10) -> None:
    """Per-cell spectra overlay with the encoding annotation — the reference
    measurement QC figure (hiprfish_imaging_reference_image_measurement.py:67)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    avgint = np.asarray(avgint)
    fig, ax = plt.subplots(figsize=(5, 3))
    for row in avgint:
        ax.plot(row, color="dodgerblue", alpha=0.3, lw=0.5)
    ax.plot(avgint.mean(axis=0), color="orangered", lw=1.5, label="mean")
    ax.set_xlabel("Channel")
    ax.set_ylabel("Intensity")
    ax.set_title(f"enc {enc} = {format(enc, f'0{n_bits}b')} "
                 f"({avgint.shape[0]} cells)", fontsize=9)
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(output_pdf, dpi=300)
    plt.close(fig)


def apply_presentation_style() -> None:
    """White-on-transparent figure styling — the reference's *_presentation
    plot variants (hiprfish_summarize_mix_experiment.py:64,
    hiprfish_summarize_titration_experiment.py:108)."""
    import matplotlib

    matplotlib.rcParams.update({
        "text.color": "white",
        "axes.edgecolor": "white",
        "axes.labelcolor": "white",
        "xtick.color": "white",
        "ytick.color": "white",
        "savefig.transparent": True,
    })


def titration_correlation(results_glob: str):
    """Input concentration vs measured abundance across mixes, linear
    regression + gross error rate at concentration 0
    (summarize_titration_experiment.py:31-106).

    Expects *_results_abundance.csv files alongside the input tables that
    carry an InputConcentration column per barcode.
    """
    from scipy import stats as sstats

    rows = []
    for f in sorted(glob.glob(results_glob)):
        ab = mean_abundance(f)
        input_tab_path = re.sub(r"_results_abundance\.csv$", ".csv", f)
        if not os.path.exists(input_tab_path):
            continue
        inp = pd.read_csv(input_tab_path)
        if "Barcodes" not in inp or "InputConcentration" not in inp:
            continue
        merged = ab.merge(inp[["Barcodes", "InputConcentration"]], on="Barcodes")
        rows.append(merged)
    if not rows:
        return None
    allrows = pd.concat(rows, ignore_index=True)
    nz = allrows[allrows.InputConcentration > 0]
    reg = sstats.linregress(nz.InputConcentration, nz.MeanAbundance)
    zero = allrows[allrows.InputConcentration == 0]
    gross_error = float(zero.MeanAbundance.sum()) if len(zero) else 0.0
    return {
        "slope": reg.slope,
        "intercept": reg.intercept,
        "rvalue": reg.rvalue,
        "gross_error_rate": gross_error,
        "table": allrows,
    }


def plot_titration_correlation(results_glob: str, output_pdf: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    res = titration_correlation(results_glob)
    if res is None:
        return None
    tab = res["table"]
    fig, ax = plt.subplots(figsize=(4, 4))
    ax.loglog(tab.InputConcentration, tab.MeanAbundance, "o", markersize=3)
    xs = np.linspace(tab.InputConcentration.min() + 1e-12,
                     tab.InputConcentration.max(), 50)
    ax.plot(xs, res["slope"] * xs + res["intercept"], "-", color="orangered")
    ax.set_xlabel("Input abundance")
    ax.set_ylabel("Measured abundance")
    ax.set_title(f"r = {res['rvalue']:.3f}", fontsize=9)
    fig.tight_layout()
    fig.savefig(output_pdf, dpi=300)
    plt.close(fig)
    return res


_N_CHECKS_BY_NBITS = {7: 4, 10: 6}  # per-laser check-bit heads per layout


def _read_cell_information(path: str, nbits: int):
    """Read one cell_information table and return (barcodes, spectra).

    Handles both on-disk schemas layout-independently:
      * headerless 7-bit files (classify_spectra.py:36-47): columns are
        [n_channels spectra | n_checks check bits | barcode | metadata...];
        the barcode column is located by value shape (nbits-wide 0/1 strings)
        and the spectra slice derived from it, instead of assuming 63
        channels or a fixed metadata width.
      * named biofilm files (biofilm_analysis.py:1232-1245 equivalent, with
        per-class probability columns): 'cell_barcode' + 'channel_<i>'.
    Returns (None, None) when no barcode column can be identified.
    """
    head = pd.read_csv(path, nrows=1)
    if "cell_barcode" in head.columns:
        df = pd.read_csv(path, dtype={"cell_barcode": str})
        chan_cols = [c for c in df.columns if re.match(r"^channel_[0-9]+$", c)]
        return df["cell_barcode"].astype(str), df.loc[:, chan_cols].astype(float)
    df = pd.read_csv(path, header=None, dtype=str)
    barcode_re = re.compile(r"^[01]{%d}(_error)?$" % nbits)
    code_col = None
    for j in range(df.shape[1]):
        vals = df.iloc[:, j].dropna().astype(str)
        if len(vals) and vals.str.match(barcode_re).all():
            code_col = j
            break
    if code_col is None:
        return None, None
    n_checks = _N_CHECKS_BY_NBITS.get(nbits, 0)
    spectra = df.iloc[:, : code_col - n_checks].astype(float)
    return df.iloc[:, code_col].astype(str), spectra


DEFAULT_SCI_NAMES = {
    # the reference's 11-taxon synthetic community
    # (analyze_multispecies_images.py:131-141)
    564: "E. coli", 1718: "C. glutamicum", 1590: "L. plantarum",
    140100: "V. albensis", 1580: "L. brevis", 438: "A. plantarum",
    104102: "A. tropicalis", 108981: "A. schindleri",
    285: "C. testosteroni", 1353: "E. gallinarum", 56459: "X. vasicola",
}

#: the reference's fixed taxon row order (analyze_multispecies_images.py:153)
DEFAULT_TAXON_ORDER = (108981, 140100, 56459, 104102, 1580, 1590, 1353, 438,
                       1718, 285, 564)


def plot_representative_cell_spectra(input_folder: str,
                                     encoding_sets=("A", "B", "C"),
                                     set_titles=("Random", "Least Complex",
                                                 "Most Complex"),
                                     block_bounds=(0, 23, 43, 57, 63),
                                     sci_names=None, taxon_order=None,
                                     output_pdf: str | None = None):
    """Per-taxon mean+/-std cell spectra in an (n_taxa, 2*n_sets) grid with
    the 4 laser blocks drawn in the reference's colors
    (analyze_multispecies_images.py:123-201). Taxa are discovered from the
    ``*_{set}_{taxid}_fov_*_cell_information.csv`` files (the reference's
    hardcoded 11-taxon table is the default name map). Returns
    {(enc_set, taxid): (mean, std)} and writes the PDF when requested."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.gridspec import GridSpec

    sci_names = DEFAULT_SCI_NAMES if sci_names is None else sci_names
    nchan = block_bounds[-1]
    colors = ["limegreen", "yellowgreen", "darkorange", "red"]

    stats = {}
    taxa_seen = []
    for enc_set in encoding_sets:
        for f in sorted(glob.glob(os.path.join(
                input_folder, f"*_{enc_set}_*_cell_information.csv"))):
            m = re.search(r"_([0-9]+)_fov_", os.path.basename(f))
            if not m:
                continue
            taxid = int(m.group(1))
            info = pd.read_csv(f, header=None)
            spectra = info.iloc[:, :nchan].astype(float).values
            stats[(enc_set, taxid)] = (spectra.mean(axis=0),
                                       spectra.std(axis=0))
            if taxid not in taxa_seen:
                taxa_seen.append(taxid)

    if taxon_order is None:
        ordered = [t for t in DEFAULT_TAXON_ORDER if t in taxa_seen]
        ordered += [t for t in taxa_seen if t not in ordered]
    else:
        ordered = [t for t in taxon_order if t in taxa_seen]

    if output_pdf is not None and ordered:
        fig = plt.figure(figsize=(9 / 2.54, 7 / 2.54))
        gs = GridSpec(max(len(ordered), 2), 2 * len(encoding_sets))
        for k, enc_set in enumerate(encoding_sets):
            for i, taxid in enumerate(ordered):
                if (enc_set, taxid) not in stats:
                    continue
                avg, std = stats[(enc_set, taxid)]
                ax = plt.subplot(gs[i, 2 * k:2 * k + 2])
                for b in range(len(block_bounds) - 1):
                    lo, hi = block_bounds[b], block_bounds[b + 1]
                    ax.errorbar(np.arange(lo, hi), avg[lo:hi],
                                yerr=std[lo:hi], color=colors[b % 4],
                                fmt="-o", markersize=0.1, capsize=0.4,
                                linewidth=1.2, elinewidth=0.2,
                                capthick=0.2, markeredgewidth=0)
                ax.set_xticks([])
                ax.set_yticks([])
                if k == 0:
                    name = sci_names.get(taxid, str(taxid))
                    ax.set_ylabel(name, rotation=0,
                                  horizontalalignment="right",
                                  rotation_mode="anchor", fontsize=6,
                                  fontstyle="italic")
                if i == 0 and k < len(set_titles):
                    ax.set_title(set_titles[k], fontsize=6)
        plt.subplots_adjust(left=0.2, right=0.98, top=0.9, bottom=0.1)
        plt.savefig(output_pdf, dpi=300, transparent=True)
        plt.close(fig)
    return stats


def summarize_multispecies_error_rate(input_folder: str,
                                      probe_design_filenames,
                                      encoding_sets=("B", "C", "A"),
                                      output_pdf: str | None = None):
    """Per-taxon error rates + Hamming-distance distributions per encoding
    set (analyze_multispecies_images.py:34-121). Returns one DataFrame per
    encoding set; renders the violin/error figure when output_pdf is set."""
    from scipy import stats as sstats

    summaries = []
    hamming_all = []
    for k, enc_set in enumerate(encoding_sets):
        filenames = sorted(
            glob.glob(os.path.join(
                input_folder, f"*_{enc_set}_*_cell_information.csv")))
        probes = pd.read_csv(probe_design_filenames[k], dtype={"code": str})
        summary = probes.loc[:, ["target_taxon", "code"]].drop_duplicates()
        summary = summary.reset_index(drop=True)
        summary["ErrorRate"] = 0.0
        summary["UpperLimit"] = 0
        hammings = {}
        for f in filenames:
            m = re.search(r"_([0-9]+)_fov_", os.path.basename(f))
            if not m:
                continue
            taxid = int(m.group(1))
            row = summary.target_taxon == taxid
            if not row.any():
                continue
            expected = summary.loc[row, "code"].values[0]
            nbits = len(expected)
            barcodes, spectra = _read_cell_information(f, nbits)
            if barcodes is None:
                continue
            max_int = spectra.values.max(axis=1)
            mode = sstats.mode(np.round(max_int, 3), axis=None, keepdims=False).mode
            keep = max_int > 0.75 * float(mode)
            kept = barcodes[keep]
            if kept.shape[0] == 0:
                continue
            err = 1 - np.mean(kept.values == expected)
            if err > 0:
                summary.loc[row, "ErrorRate"] = err
            else:
                summary.loc[row, "ErrorRate"] = 1 / kept.shape[0]
                summary.loc[row, "UpperLimit"] = 1
            hammings[taxid] = np.array(
                [hamming(str(b).split("_")[0].zfill(nbits), expected)
                 for b in kept]
            )
        summary["EncodingSet"] = enc_set
        summaries.append(summary)
        hamming_all.append(hammings)

    if output_pdf is not None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(6, 5))
        colors = ["darkviolet", "dodgerblue", "orangered"]
        for k, summary in enumerate(summaries):
            ax1.plot(np.arange(len(summary)), summary.ErrorRate, "o",
                     color=colors[k % 3], markersize=4, alpha=0.8,
                     label=summary.EncodingSet.iloc[0] if len(summary) else "")
            data = [v for v in hamming_all[k].values() if len(v)]
            if data:
                ax2.violinplot(data, positions=np.arange(len(data)) + 1 + (k - 1) * 0.1,
                               showmeans=True, showextrema=False, widths=0.5)
        ax1.set_yscale("log")
        ax1.set_ylim(1e-5, 1)
        ax1.set_ylabel("Error Rate")
        ax1.legend(fontsize=7)
        ax2.set_ylabel("Hamming distance")
        fig.tight_layout()
        fig.savefig(output_pdf, dpi=300)
        plt.close(fig)
    return summaries
