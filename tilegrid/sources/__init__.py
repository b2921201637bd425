"""Layer storage: parquet tables sorted by Z-order cell (Iceberg in
production), JSON attribute sidecars, lineage manifests, slippy/PNG sinks."""
