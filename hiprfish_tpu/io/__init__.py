"""L1 host-side I/O: image ingestion, experiment tables, output artifacts."""
