"""Data sources and sinks (CSV ingest source, parquet lake)."""
