"""L7 workflow driver: the Snakemake replacement."""
