"""CSV → lake ingest pipeline (the reference's flagship path)."""

from babylon_data_loader_spark.ingest.normalize import (
    normalize_transactions,
    validate_transactions,
)
from babylon_data_loader_spark.ingest.pipeline import IngestResult, ingest

__all__ = [
    "normalize_transactions",
    "validate_transactions",
    "ingest",
    "IngestResult",
]
