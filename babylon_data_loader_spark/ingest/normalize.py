"""Raw CSV rows → typed transaction rows.

The reference's per-row mapping loop (datalake/datalake.go:208-271)
expressed as one declarative select — Catalyst pipelines the whole
normalize+validate chain into a single whole-stage-codegen scan stage;
nothing here shuffles.

Column semantics (citations into /root/reference):
- posting_date: first non-empty of the alias chain
  ["post date", "posting date"] (datalake.go:167-189), strictly parsed
  (datalake.go:218-233), re-formatted MM/dd/yyyy (datalake.go:259).
  Unparseable/empty ⇒ row dropped (validate_transactions).
- amount: ParseFloat, unparseable ⇒ row dropped (datalake.go:235-240).
- balance: unparseable/missing ⇒ 0.0, row kept (datalake.go:242-255).
- unknown CSV columns dropped; missing ones default to ''
  (datalake.go:257-268 reads only known keys; map default is '').
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from babylon_data_loader_spark.functions.casting import (
    coalesce_nonempty,
    optional_double,
    reformat_date,
    required_double,
    strict_date,
)
from babylon_data_loader_spark.schemas import POSTING_DATE_ALIASES


def _raw(df: DataFrame, name: str) -> F.Column:
    """Reference map-lookup semantics: missing column ⇒ ''. NULLs from
    group-union padding also read as ''."""
    if name in df.columns:
        return F.coalesce(F.col(f"`{name}`"), F.lit(""))
    return F.lit("")


def normalize_transactions(raw: DataFrame) -> DataFrame:
    """Shape raw all-string rows into the transaction schema.

    Keeps `_valid_date` / `_valid_amount` marker columns so callers can
    split kept/dropped rows for stats before validate_transactions()
    filters them (Stats parity, datalake/stats.go:9-14).
    """
    posting_raw = coalesce_nonempty(
        *[_raw(raw, alias) for alias in POSTING_DATE_ALIASES]
    )
    parsed_date = strict_date(posting_raw)
    amount = required_double(_raw(raw, "amount"))
    out = raw.select(
        _raw(raw, "details").alias("details"),
        reformat_date(posting_raw).alias("posting_date"),
        _raw(raw, "description").alias("description"),
        amount.alias("amount"),
        _raw(raw, "category").alias("category"),
        _raw(raw, "type").alias("type"),
        optional_double(_raw(raw, "balance")).alias("balance"),
        _raw(raw, "check or slip #").alias("check_or_slip_num"),
        F.col("data_source"),
        F.col("account_id"),
        parsed_date.isNotNull().alias("_valid_date"),
        amount.isNotNull().alias("_valid_amount"),
        F.col("_input_file"),
    )
    return out


def validate_transactions(normalized: DataFrame) -> DataFrame:
    """Drop rows failing required-field validation (P5/P7) and strip
    marker columns. Balance is NOT validated — optional field (P8)."""
    return normalized.filter(
        F.col("_valid_date") & F.col("_valid_amount")
    ).drop("_valid_date", "_valid_amount")
