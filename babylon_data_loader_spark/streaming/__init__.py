"""Structured Streaming surfaces: streaming ingest (the reference's
directory-sweep-with-archival made properly incremental) and windowed
event analytics."""
