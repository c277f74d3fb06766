"""Reference-parity declared queries (SURVEY.md §2.8).

The `events` table plays the transactions role: cast/validate/dedup/
range/JSON-props, exactly the operator semantics of the reference's
ingest path and apiClient query surface, re-expressed over the driver
testdata so a DuckDB oracle can check them.

Every query here pushes its filters/projections to the parquet scan
(verified via .explain in tests/test_plans.py) and shuffles only where
the semantics require it (groupBy/window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from babylon_data_loader_spark.queries import query
from babylon_data_loader_spark.schemas import event_ts_us, load_table

# Shared snippets -----------------------------------------------------------

# epoch microseconds for 2024-01-10 / 2024-01-20 00:00:00 UTC
_T0_US = 1704844800000000
_T1_US = 1705708800000000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# S2/P1/P2 — scan + projection-by-name with rename ---------------------------


@query(
    "q_scan_project",
    oracle="""
    SELECT event_id AS id, lower(event_type) AS etype, value AS amount
    FROM events
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection by name + rename (reference csv/csv.go:64-91,
    datalake/datalake.go:257-268): order-independent column selection."""
    return _events(spark, sf_dir).select(
        F.col("event_id").alias("id"),
        F.lower("event_type").alias("etype"),
        F.col("value").alias("amount"),
    )


# S1 — directory scan / file accounting --------------------------------------


@query(
    "q_source_file_count",
    oracle="SELECT CAST(1 AS BIGINT) AS n_files",
)
def q_source_file_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-listing count (reference datalake/client.go:45-51) via
    input_file_name(): each testdata table is one parquet file."""
    return (
        _events(spark, sf_dir)
        .select(F.input_file_name().alias("f"))
        .agg(F.count_distinct("f").alias("n_files"))
    )


# S4/P14 — filename-style regex capture ---------------------------------------


@query(
    "q_regex_extract",
    oracle=r"""
    SELECT c_custkey,
           CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT)
             AS name_key
    FROM customer
    WHERE regexp_extract(c_name, 'Customer#(\d+)', 1) <> ''
    """,
)
def q_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex capture-group extraction — the chase(\\d{4}) account-id
    pattern (reference generic_extractor.go:22-24) over customer names."""
    cust = load_table(spark, sf_dir, "customer")
    key = F.regexp_extract("c_name", r"Customer#(\d+)", 1)
    return cust.filter(key != "").select(
        "c_custkey", key.cast("bigint").alias("name_key")
    )


# P13 — case-insensitive contains / prefix predicates -------------------------


@query(
    "q_string_predicates",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM documents
    WHERE contains(lower(text), 'spark') AND starts_with(source, 'src1')
    GROUP BY lang
    """,
)
def q_string_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lower/contains/prefix predicates (reference
    generic_extractor.go:18-33, datalake.go:324)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(
            F.lower("text").contains("spark")
            & F.col("source").startswith("src1")
        )
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# P4/P6 — multi-alias coalesce + date reformat --------------------------------


@query(
    "q_coalesce_date",
    oracle="""
    SELECT o_orderkey,
           coalesce(
             nullif(CASE WHEN o_orderkey % 2 = 0
                         THEN strftime(o_orderdate, '%m/%d/%Y') ELSE '' END, ''),
             nullif(CASE WHEN o_orderkey % 2 = 1
                         THEN strftime(o_orderdate, '%m/%d/%Y') ELSE '' END, '')
           ) AS posting_date
    FROM orders
    """,
)
def q_coalesce_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-non-empty alias chain (reference datalake.go:167-189): the
    'Post Date'/'Posting Date' header split simulated by parity."""
    orders = load_table(spark, sf_dir, "orders")
    fmt = F.date_format("o_orderdate", "MM/dd/yyyy")
    primary = F.when(F.col("o_orderkey") % 2 == 0, fmt).otherwise(F.lit(""))
    alias = F.when(F.col("o_orderkey") % 2 == 1, fmt).otherwise(F.lit(""))
    posting = F.coalesce(F.nullif(primary, F.lit("")), F.nullif(alias, F.lit("")))
    return orders.select("o_orderkey", posting.alias("posting_date"))


# P5 — strict date parse, invalid ⇒ row dropped -------------------------------


@query(
    "q_strict_date_parse",
    oracle="""
    WITH raw AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 10 = 0 THEN 'InvalidDate'
                  WHEN o_orderkey % 10 = 1 THEN '13/45/2024'
                  ELSE strftime(o_orderdate, '%m/%d/%Y') END AS s
      FROM orders
    )
    SELECT o_orderkey, CAST(try_strptime(s, '%m/%d/%Y') AS DATE) AS d
    FROM raw
    WHERE try_strptime(s, '%m/%d/%Y') IS NOT NULL
    """,
)
def q_strict_date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict MM/dd/yyyy parse with drop-on-failure (reference
    datalake.go:218-233): both malformed and out-of-range dates die."""
    orders = load_table(spark, sf_dir, "orders")
    s = (
        F.when(F.col("o_orderkey") % 10 == 0, F.lit("InvalidDate"))
        .when(F.col("o_orderkey") % 10 == 1, F.lit("13/45/2024"))
        .otherwise(F.date_format("o_orderdate", "MM/dd/yyyy"))
    )
    parsed = F.try_to_date(s, "MM/dd/yyyy")
    return (
        orders.select("o_orderkey", parsed.alias("d"))
        .filter(F.col("d").isNotNull())
    )


# P7 — required numeric cast, invalid ⇒ row dropped ---------------------------


@query(
    "q_filter_cast",
    oracle="""
    WITH raw AS (
      SELECT event_id,
             CASE WHEN event_id % 7 = 0 THEN 'not_a_number'
                  ELSE printf('%.2f', value) END AS s
      FROM events
    )
    SELECT event_id, TRY_CAST(s AS DOUBLE) AS amount
    FROM raw
    WHERE TRY_CAST(s AS DOUBLE) IS NOT NULL
    """,
)
def q_filter_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ParseFloat-or-drop (reference datalake.go:235-240)."""
    ev = _events(spark, sf_dir)
    s = F.when(F.col("event_id") % 7 == 0, F.lit("not_a_number")).otherwise(
        F.format_string("%.2f", F.col("value"))
    )
    amount = s.try_cast("double")
    return ev.select("event_id", amount.alias("amount")).filter(
        F.col("amount").isNotNull()
    )


# P8 — optional numeric cast with default, row KEPT ---------------------------


@query(
    "q_cast_default",
    oracle="""
    SELECT event_id,
           coalesce(
             TRY_CAST(CASE WHEN event_id % 7 = 0 THEN 'not_a_number'
                           ELSE printf('%.2f', value) END AS DOUBLE),
             0.0) AS balance
    FROM events
    """,
)
def q_cast_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balance semantics: unparseable ⇒ 0.0, row kept — the P7/P8
    asymmetry (reference datalake.go:242-255)."""
    ev = _events(spark, sf_dir)
    s = F.when(F.col("event_id") % 7 == 0, F.lit("not_a_number")).otherwise(
        F.format_string("%.2f", F.col("value"))
    )
    return ev.select(
        "event_id",
        F.coalesce(s.try_cast("double"), F.lit(0.0)).alias("balance"),
    )


# S6 — required-columns-not-null filter ---------------------------------------


@query(
    "q_filter_nonnull",
    oracle="""
    WITH raw AS (
      SELECT CASE WHEN event_id % 5 = 0 THEN NULL ELSE event_type END AS et,
             props
      FROM events
    )
    SELECT et, CAST(COUNT(*) AS BIGINT) AS n
    FROM raw
    WHERE et IS NOT NULL AND props IS NOT NULL
    GROUP BY et
    """,
)
def q_filter_nonnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Short-row/NULL-required-field drop (reference csv/csv.go:82-84
    reproduced as a null filter — SURVEY.md S6)."""
    ev = _events(spark, sf_dir)
    et = F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(
        F.col("event_type")
    )
    return (
        ev.select(et.alias("et"), "props")
        .filter(F.col("et").isNotNull() & F.col("props").isNotNull())
        .groupBy("et")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# S7 — dedup on composite key with deterministic survivor ---------------------


@query(
    "q_dedup_key",
    oracle="""
    SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us, value
    FROM events
    QUALIFY row_number() OVER (
      PARTITION BY user_id, event_type
      ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def q_dedup_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert-key collapse (reference storage/mongo_repository.go:44-57)
    with the engine's defined last-write-wins tiebreak: newest ts,
    then highest event_id."""
    ev = _events(spark, sf_dir)
    # Order by MICROsecond ts (event_ts_us), matching DuckDB's
    # micro-precision timestamps, so both engines pick the same
    # survivor; event_id breaks ties ⇒ identical total order.
    w = Window.partitionBy("user_id", "event_type").orderBy(
        event_ts_us(ev).desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            event_ts_us(ev).alias("ts_us"),
            "value",
        )
    )


# S8 — partitioned-sink counts -------------------------------------------------


@query(
    "q_partition_counts",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def q_partition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows per physical partition (reference: one collection per
    source, storage/mongo_repository.go:55)."""
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# S9/A1 — sync-log aggregate ---------------------------------------------------


@query(
    "q_sync_log_agg",
    oracle="""
    SELECT 'transactions_' || event_type AS collection_name,
           CAST(COUNT(*) AS BIGINT) AS records_uploaded,
           MAX(epoch_us(ts)) AS last_sync_us
    FROM events GROUP BY event_type
    """,
)
def q_sync_log_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SyncLog row shape (reference storage/mongo_repository.go:62-72):
    collection name, batch count, last-write time (deterministic max
    instead of wall clock so the oracle can hash it)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("records_uploaded"),
            F.max(event_ts_us(ev)).alias("last_sync_us"),
        )
        .select(
            F.concat(F.lit("transactions_"), F.col("event_type")).alias(
                "collection_name"
            ),
            "records_uploaded",
            "last_sync_us",
        )
    )


# A2 — run-stats counters (conditional aggregation) ---------------------------


@query(
    "q_stats_agg",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS total_rows,
           CAST(SUM(CASE WHEN event_id % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS valid_rows,
           CAST(SUM(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS failed_rows
    FROM events
    """,
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats counters (reference datalake/stats.go:9-31) as one
    conditional aggregation — map-side combinable, no driver counters."""
    ev = _events(spark, sf_dir)
    bad = F.col("event_id") % 7 == 0
    return ev.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.sum(F.when(~bad, 1).otherwise(0)).cast("bigint").alias("valid_rows"),
        F.sum(F.when(bad, 1).otherwise(0)).cast("bigint").alias("failed_rows"),
    )


# Q1 — point lookup ------------------------------------------------------------


@query(
    "q_point_lookup",
    oracle="""
    SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value, props
    FROM events WHERE event_id = 987
    """,
)
def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GetTransactionByID (reference apiClient/apiClient.go:188-243):
    equi-filter pushed to the scan."""
    ev = _events(spark, sf_dir)
    return (
        ev.filter(F.col("event_id") == 987)
        .select(
            "event_id",
            "user_id",
            "event_type",
            event_ts_us(ev).alias("ts_us"),
            "value",
            "props",
        )
    )


# Q2 — time-range scan by type ---------------------------------------------------


@query(
    "q_range_ts",
    oracle=f"""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
    FROM events
    WHERE event_type = 'purchase'
      AND epoch_us(ts) BETWEEN {_T0_US} AND {_T1_US}
    """,
)
def q_range_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GetTransactionHistory (reference apiClient.go:305-358): type +
    [start,end] epoch range; at lake scale this prunes ts partitions."""
    ev = _events(spark, sf_dir)
    ts_us = event_ts_us(ev)
    return ev.filter(
        (F.col("event_type") == "purchase")
        & ts_us.between(_T0_US, _T1_US)
    ).select(
        "event_id", "user_id", ts_us.alias("ts_us"), "value"
    )


# Q5 — ingress/egress classification --------------------------------------------


@query(
    "q_type_classify",
    oracle="""
    SELECT CASE WHEN value < 50 THEN 'egress' ELSE 'ingress' END AS txn_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1
    """,
)
def q_type_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ingress/egress dichotomy (reference apiClient.go:99-114)."""
    ev = _events(spark, sf_dir)
    txn_type = F.when(F.col("value") < 50, "egress").otherwise("ingress")
    return (
        ev.groupBy(txn_type.alias("txn_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(20,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


# JSON props extraction ----------------------------------------------------------


@query(
    "q_json_extract",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events WHERE props IS NOT NULL
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction over the props column (SURVEY.md §2.7)."""
    ev = _events(spark, sf_dir)
    return ev.filter(F.col("props").isNotNull()).select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )


# Flagship — the reference-shaped pipeline in one plan -----------------------


@query(
    "q_flagship_pipeline",
    oracle="""
    WITH valid AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
    ), deduped AS (
      SELECT * FROM valid
      QUALIFY row_number() OVER (
        PARTITION BY user_id, event_type, ts_us
        ORDER BY event_id DESC) = 1
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS total_value,
           MIN(ts_us) AS first_us,
           MAX(ts_us) AS last_us
    FROM deduped GROUP BY event_type
    """,
)
def q_flagship_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's scan → validate → dedup-on-key → grouped-counts
    pipeline (SURVEY.md §3.1) over events: exercises P5/P7 validation,
    S7 key-dedup, and S9/A1 aggregation in one plan."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    ts_us = event_ts_us(ev)
    valid = ev.filter(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col("event_type").isNotNull()
    ).select(
        "user_id", "event_type", ts_us.alias("ts_us"), "event_id", "value"
    )
    w = Window.partitionBy("user_id", "event_type", "ts_us").orderBy(
        F.col("event_id").desc()
    )
    deduped = (
        valid.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(20,2)"))
        .cast("double")
        .alias("total_value"),
        F.min("ts_us").alias("first_us"),
        F.max("ts_us").alias("last_us"),
    )


# S7 full MERGE semantics simulated on deterministic data ------------------------


@query(
    "q_merge_upsert",
    oracle="""
    WITH stored AS (
      SELECT event_id, value, 'stored' AS origin
      FROM events WHERE event_id % 3 <> 0
    ), batch AS (
      SELECT event_id, value + 1000.0 AS value, 'batch' AS origin
      FROM events WHERE event_id % 2 = 0
    )
    SELECT * FROM batch
    UNION ALL
    SELECT s.* FROM stored s
    WHERE NOT EXISTS (SELECT 1 FROM batch b WHERE b.event_id = s.event_id)
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (reference upsert S7): batch rows replace
    same-key stored rows, everything else survives. Anti-join + union —
    the plain-parquet merge strategy of operators/merge.py."""
    ev = _events(spark, sf_dir)
    stored = ev.filter(F.col("event_id") % 3 != 0).select(
        "event_id", "value", F.lit("stored").alias("origin")
    )
    batch = ev.filter(F.col("event_id") % 2 == 0).select(
        "event_id",
        (F.col("value") + 1000.0).alias("value"),
        F.lit("batch").alias("origin"),
    )
    survivors = stored.join(
        batch.select("event_id"), on="event_id", how="left_anti"
    )
    return batch.unionByName(survivors)
