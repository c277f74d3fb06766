"""Synthetic transaction-data generator (reference G1/G2).

Mirrors synthetic/data.go:40-63: uniform amount ∈ [0,1000), balance ∈
[0,10000), random 4-digit zero-padded account id, constants
SALE/DEBIT/synthetic, today's date, ``Synthetic transaction {i}``
descriptions; CSV output writes the exact 8-column header with
%.2f-formatted numbers (synthetic/data.go:108-160).

Spark-first: `spark.range(n)` + column expressions — generation is
partition-parallel, no driver-side row building. `seed` makes runs
reproducible (the reference's generator is unseeded; tests need
determinism)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Bounds from reference synthetic/data.go:16-23.
MAX_AMOUNT = 1000.0
MAX_BALANCE = 10000.0
MAX_ACCOUNT = 10000

CSV_HEADER = [
    "Details",
    "Posting Date",
    "Description",
    "Category",
    "Amount",
    "Type",
    "Balance",
    "Check or Slip #",
]


def generate_synthetic(
    spark: SparkSession, rows: int = 100, seed: int | None = None
) -> DataFrame:
    """Rows in the transaction shape (reference GenerateSyntheticDocuments)."""
    base = spark.range(rows)
    r1 = F.rand(seed) if seed is not None else F.rand()
    r2 = F.rand(seed + 1) if seed is not None else F.rand()
    r3 = F.rand(seed + 2) if seed is not None else F.rand()
    return base.select(
        F.lit("SALE").alias("details"),
        F.date_format(F.current_date(), "MM/dd/yyyy").alias("posting_date"),
        F.format_string("Synthetic transaction %d", F.col("id")).alias(
            "description"
        ),
        F.round(r1 * MAX_AMOUNT, 2).alias("amount"),
        F.lit("synthetic").alias("category"),
        F.lit("DEBIT").alias("type"),
        F.round(r2 * MAX_BALANCE, 2).alias("balance"),
        F.lit("").alias("check_or_slip_num"),
        F.lpad(
            F.floor(r3 * MAX_ACCOUNT).cast("string"), 4, "0"
        ).alias("account_id"),
    )


def write_synthetic_csv(
    df: DataFrame,
    directory: str,
    file_name: str = "test-synthetic-data.csv",
) -> None:
    """CSV sink with the reference's exact header and 2-dp number
    formatting (synthetic/data.go:127-151), written as ONE file named
    `file_name` — the reference writes ``test-synthetic-data.csv``
    (synthetic/data.go), whose 'synthetic' substring is what the
    filename extractor keys on, so generated output is directly
    ingestible without renaming Spark part files (round-1 ADVICE)."""
    import os
    import shutil

    out = df.select(
        F.col("details").alias("Details"),
        F.col("posting_date").alias("Posting Date"),
        F.col("description").alias("Description"),
        F.col("category").alias("Category"),
        F.format_string("%.2f", F.col("amount")).alias("Amount"),
        F.col("type").alias("Type"),
        F.format_string("%.2f", F.col("balance")).alias("Balance"),
        F.col("check_or_slip_num").alias("Check or Slip #"),
    )
    staging = os.path.join(directory, "__csv_staging")
    out.coalesce(1).write.mode("overwrite").option("header", True).csv(
        staging
    )
    part = next(
        f
        for f in os.listdir(staging)
        if f.startswith("part-") and f.endswith(".csv")
    )
    os.replace(
        os.path.join(staging, part), os.path.join(directory, file_name)
    )
    shutil.rmtree(staging, ignore_errors=True)


def append_to_lake(
    spark: SparkSession, df: DataFrame, lake_path: str
) -> None:
    """Plain append sink (reference PersistSyntheticData,
    synthetic/data.go:66-91): no merge — straight InsertMany analog,
    committed atomically through the transactional lake."""
    from babylon_data_loader_spark.operators.tx_lake import (
        TransactionalLake,
    )

    # open(): honor a migrated lake's recorded partition column (a
    # default-constructed handle would fail fast rather than corrupt,
    # but appending synthetic rows to a migrated lake should just work)
    TransactionalLake.open(lake_path).append(
        spark, df.withColumn("data_source", F.lit("synthetic"))
    )
