"""Declared-query registry: every operator from SURVEY.md §2 that the
driver verifies against a DuckDB oracle at sf0.01.

Each query is a `(spark, sf_dir) -> DataFrame` callable registered with
an equivalent ANSI-SQL oracle string (or None for genuinely
non-SQL-expressible operators, which get a weaker rows-only check).

Exact-match discipline (SURVEY.md §7 hard-part 4):
- every computed column aliased identically in Spark and SQL
- cross-row float sums go through DECIMAL (exact) then cast to DOUBLE
- event timestamps compared in integer MICROseconds (`ts div 1000` vs
  DuckDB `epoch_us`): the parquet stores nanos, Spark reads exact nanos
  as BIGINT, DuckDB truncates to micros
- deterministic tiebreaks on every window/top-k
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a declared query and (optionally) its DuckDB oracle."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module (they self-register)."""
    from babylon_data_loader_spark.queries import (  # noqa: F401
        analytics,
        core,
        extra,
        intervals,
        media,
        text,
        tpch_more,
        tpch_sub,
        vectors,
        wave3,
    )
