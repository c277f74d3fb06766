"""babylon_data_loader_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference data loader (ajponte/babylon_data_loader): CSV ingest with
filename-derived metadata, validate/cast/drop semantics, dedup-upsert
(merge) into a partitioned data lake, a query surface (point lookup,
time-range scan, classification), a synthetic-data generator — plus
the large-scale training-data-pipeline operators a 100 TB deployment
needs (dedup families, similarity search, text analysis, multimodal
column plumbing, streaming ingest).

Design principles (see SURVEY.md):
- Declarative DataFrame plans; let Catalyst/AQE choose physical plans.
- No row-at-a-time Python in hot paths; built-in functions first,
  Arrow-batched pandas UDFs only where built-ins cannot express it.
- Every operator partition-aware: broadcast small sides, pre-aggregate
  before shuffles, push filters to the scan.
"""

__version__ = "0.1.0"

from babylon_data_loader_spark.session import build_session, configure_session

__all__ = ["build_session", "configure_session", "__version__"]
