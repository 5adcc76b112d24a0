"""L2-L4, L6 pipeline layer: registration+segmentation engines, per-cell
measurement, spectral classification, experiment collection/summaries."""
