"""L7 CLI entry points, flag-compatible with the reference scripts.

python -m hiprfish_tpu.cli.measure              <- hiprfish_imaging_spectral_image_measurement.py
python -m hiprfish_tpu.cli.measure_multispecies <- hiprfish_imaging_multispecies_spectral_image_measurement.py
python -m hiprfish_tpu.cli.classify             <- hiprfish_imaging_image_classification.py
python -m hiprfish_tpu.cli.classify_spectra     <- hiprfish_imaging_classify_spectra.py
python -m hiprfish_tpu.cli.collect              <- hiprfish_imaging_collect_measurement_results.py
python -m hiprfish_tpu.cli.train                <- hiprfish_imaging_train_reference.py
python -m hiprfish_tpu.cli.biofilm              <- hiprfish_imaging_biofilm_analysis.py
python -m hiprfish_tpu.cli.summarize_mix        <- hiprfish_summarize_mix_experiment.py
python -m hiprfish_tpu.cli.summarize_titration  <- hiprfish_summarize_titration_experiment.py
python -m hiprfish_tpu.cli.analyze_multispecies <- hiprfish_imaging_analyze_multispecies_images.py
python -m hiprfish_tpu.cli.workflow             <- snakemake driver replacement
"""


def resolve_classifier_path(path: str) -> str:
    """Map the reference's .pkl filename conventions onto our .npz artifact."""
    if path.endswith(".pkl"):
        return path[: -len(".pkl")] + ".npz"
    return path
