"""Sources & sinks: synthetic page-graph generator, seed readers, and the
atomic round-checkpoint store (parquet-with-commit-marker; Iceberg-shaped)."""
