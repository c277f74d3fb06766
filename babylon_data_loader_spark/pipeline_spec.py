"""Declarative pipeline runner: a JSON/dict spec → source → steps →
sink, executed as ONE Spark logical plan.

The reference is a config-driven loader end to end (LoadConfig wires
the CSV→validate→Mongo pipeline, config/loadConfig.go:15-34); this
generalizes that idea to a small declarative op vocabulary so a
pipeline can live in version control as data, not code — the shape
every orchestrated production load converges on (dbt model /
DLT pipeline / reference's env-config, same idea).

Design rules:
- Every step maps to a DataFrame transformation — the whole pipeline
  stays ONE lazy plan, so Catalyst optimizes across step boundaries
  (a `filter` step after a `select` still pushes down to the scan;
  nothing materializes between steps).
- Validation is fail-fast and total: unknown ops, missing keys, and
  bad types raise PipelineSpecError naming the step index BEFORE any
  read or write happens.
- The `expectations` step routes violations to a quarantine parquet
  path (operators/expectations.py) and continues with passing rows;
  a fail-action violation aborts before the sink writes.
- Sinks: parquet overwrite, or transactional MERGE into the lake
  (operators/tx_lake.py) — the reference's dedup-upsert semantics.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class PipelineSpecError(ValueError):
    """The spec is malformed; raised before any I/O."""


_STEP_OPS = {
    "filter",
    "select",
    "with_column",
    "rename",
    "drop",
    "dedup",
    "expectations",
}
_SOURCE_FORMATS = {"parquet", "csv", "jsonl", "orc"}
_SINK_TYPES = {"parquet", "lake_merge"}


def _fail(i: int | None, msg: str) -> None:
    where = "spec" if i is None else f"step {i}"
    raise PipelineSpecError(f"{where}: {msg}")


def validate_spec(spec: dict[str, Any]) -> None:
    """Structural validation, no I/O. Raises PipelineSpecError."""
    src = spec.get("source")
    if not isinstance(src, dict):
        _fail(None, "missing 'source' object")
    if src.get("format", "parquet") not in _SOURCE_FORMATS:
        _fail(None, f"unknown source format {src.get('format')!r}")
    if not src.get("path"):
        _fail(None, "source needs a 'path'")
    for i, step in enumerate(spec.get("steps", [])):
        op = step.get("op")
        if op not in _STEP_OPS:
            _fail(i, f"unknown op {op!r} (have {sorted(_STEP_OPS)})")
        if op == "filter" and not step.get("predicate"):
            _fail(i, "filter needs 'predicate'")
        if op == "select" and not step.get("columns"):
            _fail(i, "select needs 'columns'")
        if op == "with_column" and not (
            step.get("name") and step.get("expr")
        ):
            _fail(i, "with_column needs 'name' and 'expr'")
        if op == "rename" and not step.get("columns"):
            _fail(i, "rename needs a 'columns' {old: new} map")
        if op == "drop" and not step.get("columns"):
            _fail(i, "drop needs 'columns'")
        if op == "dedup" and not step.get("keys"):
            _fail(i, "dedup needs 'keys'")
        if op == "expectations":
            contract = step.get("contract")
            if not isinstance(contract, list) or not contract:
                _fail(i, "expectations needs a non-empty 'contract' list")
            for e in contract:
                if not (e.get("name") and e.get("predicate")):
                    _fail(i, "each expectation needs name + predicate")
    sink = spec.get("sink")
    if not isinstance(sink, dict):
        _fail(None, "missing 'sink' object")
    if sink.get("type") not in _SINK_TYPES:
        _fail(None, f"unknown sink type {sink.get('type')!r}")
    if not sink.get("path"):
        _fail(None, "sink needs a 'path'")
    if sink["type"] == "lake_merge":
        key = sink.get("key")
        # A bare string key would later hit list('user_id') and split
        # into single-character column names — normalize it here and
        # require every element be a non-empty string so the error is
        # a spec error, not a downstream unresolved-column failure.
        if isinstance(key, str):
            key = [key]
            sink["key"] = key
        if (
            not isinstance(key, list)
            or not key
            or not all(isinstance(k, str) and k for k in key)
        ):
            _fail(
                None,
                "lake_merge sink needs 'key': a non-empty string or "
                "list of non-empty strings",
            )
        if not sink.get("partition_col"):
            _fail(None, "lake_merge sink needs 'partition_col'")


def _read_source(spark: SparkSession, src: dict[str, Any]) -> DataFrame:
    fmt = src.get("format", "parquet")
    if fmt == "parquet":
        return spark.read.parquet(src["path"])
    if fmt == "orc":
        return spark.read.orc(src["path"])
    if fmt == "jsonl":
        return spark.read.json(src["path"])
    # csv: header row + schema inference off by default (explicit
    # schema string wins — inference is a second full scan at scale)
    reader = spark.read.option("header", str(src.get("header", True)))
    if src.get("schema"):
        reader = reader.schema(src["schema"])
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(src["path"])


def run_pipeline(
    spark: SparkSession, spec: dict[str, Any]
) -> dict[str, Any]:
    """Validate, build the single lazy plan, execute the sink write.
    Returns {'rows_written', 'quarantined', 'sink_path'}."""
    from babylon_data_loader_spark.operators.expectations import (
        Expectation,
        apply_expectations,
        enforce,
    )

    validate_spec(spec)
    df = _read_source(spark, spec["source"])
    quarantined_total = 0
    for i, step in enumerate(spec.get("steps", [])):
        op = step["op"]
        if op == "filter":
            df = df.filter(step["predicate"])
        elif op == "select":
            df = df.select(*step["columns"])
        elif op == "with_column":
            df = df.withColumn(step["name"], F.expr(step["expr"]))
        elif op == "rename":
            for old, new in step["columns"].items():
                df = df.withColumnRenamed(old, new)
        elif op == "drop":
            df = df.drop(*step["columns"])
        elif op == "dedup":
            # deterministic survivor: max over the remaining columns
            # per key would need an order column; spec keeps the
            # simple distinct-on-keys semantics via dropDuplicates
            # with an optional explicit tiebreak order column.
            order = step.get("keep_max_by")
            if order:
                from pyspark.sql import Window

                w = Window.partitionBy(*step["keys"]).orderBy(
                    F.col(order).desc()
                )
                df = (
                    df.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1)
                    .drop("__rn")
                )
            else:
                df = df.dropDuplicates(step["keys"])
        elif op == "expectations":
            expectations = [
                Expectation(
                    e["name"],
                    e["predicate"],
                    e.get("action", "quarantine"),
                )
                for e in step["contract"]
            ]
            if any(e.action == "fail" for e in expectations):
                res = enforce(spark, df, expectations)  # raises on fail
            else:
                res = apply_expectations(df, expectations)
            qpath = step.get("quarantine_path")
            if qpath:
                q = res.quarantined.withColumn(
                    "violations", F.array_join("violations", ",")
                )
                q.write.mode("overwrite").parquet(qpath)
                quarantined_total += spark.read.parquet(qpath).count()
            df = res.passed
    sink = spec["sink"]
    if sink["type"] == "parquet":
        writer = df.write.mode(sink.get("mode", "overwrite"))
        if sink.get("partition_by"):
            writer = writer.partitionBy(*sink["partition_by"])
        writer.parquet(sink["path"])
        rows = spark.read.parquet(sink["path"]).count()
    else:  # lake_merge
        from babylon_data_loader_spark.operators.tx_lake import (
            TransactionalLake,
        )

        # open() honors the partition column RECORDED in the lake's
        # manifest; merging under the spec's column against a migrated
        # lake would partition new dirs wrongly and silently resurrect
        # same-key rows. A disagreement is a spec error, not a
        # preference.
        lake = TransactionalLake.open(
            sink["path"], partition_col=sink["partition_col"]
        )
        if lake.partition_col != sink["partition_col"]:
            raise ValueError(
                f"lake at {sink['path']!r} records partition_col="
                f"{lake.partition_col!r} but the spec says "
                f"{sink['partition_col']!r}"
            )
        lake.merge(spark, df, key=list(sink["key"]))
        rows = lake.read(spark).count()
    return {
        "rows_written": rows,
        "quarantined": quarantined_total,
        "sink_path": sink["path"],
    }
