"""Sources: the deterministic synthetic pages table + parquet readers."""
