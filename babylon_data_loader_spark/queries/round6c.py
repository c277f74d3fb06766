"""Round-6 third wave: split-hygiene operators — the two checks a
training pipeline runs BETWEEN dedup and the trainer.

- `q_split_leakage`: verified near-duplicate pairs whose members land
  in DIFFERENT md5-hash splits (train/val/test). Exact-dedup-then-
  split pipelines still leak near-duplicates across the eval
  boundary; this measures that leak directly, composing the SAME
  verified machinery as q_dedup_clusters (banded MinHash candidates →
  exact Jaccard ≥ 0.5) with the SAME deterministic split assignment
  as q_hash_split — so a green row certifies the composition, not a
  third re-implementation.
- `q_dup_weight`: duplication-aware loss weights — every document
  gets weight 1/|its near-dup cluster|, the drop-nothing alternative
  to hard dedup (total loss mass per unique content is constant, so
  boilerplate can't dominate training). Cluster ids come from the
  min-label connected components operator; the weight is ONE IEEE
  division (exact in both engines), no float accumulation.

Scale notes: both queries ride the shared at-rest shingle/signature
stores (tokenize+shingle runs once per dataset version) and the
bucketed LSH candidate generator (hot-bucket-guarded, id-only
shuffles). The split map is a narrow (id, 5-char split) projection;
joining it to the PAIR stream — never the reverse — keeps the extra
shuffles candidate-scale. Reference analogue: none (the reference
ETL loader has no ML-prep surface); extends SURVEY.md §2's
training-data growth track alongside round6.py / round6b.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from babylon_data_loader_spark.functions.cache import persist_tracked
from babylon_data_loader_spark.queries import query
from babylon_data_loader_spark.queries.extra import (
    _jaccard_band_sql,
    _JACCARD_SHINGLES,
)
from babylon_data_loader_spark.schemas import load_table

# The q_dedup_clusters candidate+verify chain (queries/extra.py), up
# to the verified pair set — kept textually shared so the two oracles
# cannot drift from the cluster query's.
_VERIFIED_PAIRS_CTE = (
    """
    WITH RECURSIVE sig AS (
      SELECT doc_id, """
    + ", ".join(f"{_jaccard_band_sql(i)} AS b{i}" for i in range(4))
    + """
      FROM documents
    ), bands AS (
    """
    + "\nUNION ALL\n".join(
        f"SELECT doc_id, {i} AS bi, b{i} AS bv FROM sig" for i in range(4)
    )
    + f"""
    ), sized AS (
      SELECT doc_id, bi, bv FROM bands
      QUALIFY COUNT(*) OVER (PARTITION BY bi, bv) <= 1000
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sized a JOIN sized b
        ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
    ), sh AS (
      SELECT doc_id, unnest({_JACCARD_SHINGLES}) AS s FROM documents
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS i
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.doc_a
      JOIN sh sb ON sb.doc_id = c.doc_b AND sb.s = sa.s
      GROUP BY c.doc_a, c.doc_b
    ), pairs AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i
      JOIN sizes za ON za.doc_id = i.doc_a
      JOIN sizes zb ON zb.doc_id = i.doc_b
      WHERE CAST(i.i AS DOUBLE) / CAST(za.sz + zb.sz - i.i AS DOUBLE) >= 0.5
    )"""
)

# Same salt + thresholds as q_hash_split (queries/wave3.py) — the
# point is that THIS split function, applied to THIS corpus, leaks.
_SPLIT_SQL = """
  CASE WHEN substr(md5('split:' || CAST({id} AS VARCHAR)), 1, 2)
            < 'cc' THEN 'train'
       WHEN substr(md5('split:' || CAST({id} AS VARCHAR)), 1, 2)
            < 'e6' THEN 'val'
       ELSE 'test' END
"""


def _split_col(id_col) -> F.Column:
    prefix = F.substring(
        F.md5(F.concat(F.lit("split:"), id_col.cast("string"))), 1, 2
    )
    return (
        F.when(prefix < "cc", "train")
        .when(prefix < "e6", "val")
        .otherwise("test")
    )


def _verified_pairs(docs: DataFrame) -> DataFrame:
    """Verified near-dup pair set via the shared at-rest store
    (operators/dedup.py::stored_verified_pairs — r6 VERDICT ask #5):
    the candidate+verify chain is built once per dataset version and
    q_split_leakage / q_dup_weight / q_dedup_clusters /
    q_near_dup_rate / q_jaccard_pairs all read the same parquet."""
    from babylon_data_loader_spark.operators.dedup import (
        stored_verified_pairs,
    )

    return stored_verified_pairs(docs).select("doc_a", "doc_b")


@query(
    "q_split_leakage",
    oracle=_VERIFIED_PAIRS_CTE
    + f""", tagged AS (
      SELECT doc_id, {_SPLIT_SQL.format(id="doc_id")} AS split
      FROM documents
    )
    SELECT least(ta.split, tb.split) AS split_a,
           greatest(ta.split, tb.split) AS split_b,
           CAST(COUNT(*) AS BIGINT) AS leaked_pairs
    FROM pairs p
    JOIN tagged ta ON ta.doc_id = p.doc_a
    JOIN tagged tb ON tb.doc_id = p.doc_b
    WHERE ta.split <> tb.split
    GROUP BY 1, 2
    ORDER BY split_a, split_b
    """,
)
def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs crossing the train/val/test hash-split boundary,
    counted per split combination — the eval-contamination a split
    done BEFORE (or without) fuzzy dedup silently ships. The pair
    stream is candidate-scale; the corpus-scale split map joins INTO
    it by id, so the wide text column never rides the extra shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    dup = _verified_pairs(docs)
    splits = docs.select("doc_id", _split_col(F.col("doc_id")).alias("split"))
    leak = (
        dup.join(
            splits.select(
                F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")
            ),
            on="doc_a",
        )
        .join(
            splits.select(
                F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")
            ),
            on="doc_b",
        )
        .filter(F.col("sa") != F.col("sb"))
    )
    return (
        leak.select(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("leaked_pairs"))
        .orderBy("split_a", "split_b")
    )


@query(
    "q_dup_weight",
    oracle=_VERIFIED_PAIRS_CTE
    + """, edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION ALL
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ), walk AS (
      SELECT doc_id AS node, doc_id AS label FROM documents
      UNION
      SELECT e.b AS node, w.label FROM walk w JOIN edges e ON e.a = w.node
    ), cl AS (
      SELECT node AS doc_id, CAST(MIN(label) AS BIGINT) AS cluster_id
      FROM walk GROUP BY node
    ), sz AS (
      SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM cl GROUP BY cluster_id
    )
    SELECT c.doc_id, c.cluster_id, s.cluster_size,
           CAST(1.0 AS DOUBLE) / CAST(s.cluster_size AS DOUBLE)
             AS weight
    FROM cl c JOIN sz s ON s.cluster_id = c.cluster_id
    ORDER BY c.doc_id
    """,
)
def q_dup_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication-aware loss weight per document: 1/|near-dup
    cluster|, so each unique piece of content contributes constant
    total weight however many times it was crawled — the keep-
    everything alternative to dropping duplicates. Cluster sizes are
    one narrow count over the components frame joined back by
    cluster id; the weight is a single UNROUNDED IEEE division of
    exact integers (bit-identical across engines — no accumulation,
    and no round(x, 9), whose half-way behaviour differs across
    engine builds when the ratio's decimal expansion terminates at
    the boundary — the r6 token-budget hash-fail class)."""
    from babylon_data_loader_spark.operators.dedup import (
        stored_doc_components,
    )

    docs = load_table(spark, sf_dir, "documents")
    # r16: component labels from the shared at-rest store — the
    # min-label iteration over the verified-pair graph is a pure
    # function of the corpus version; warm runs read one id-width
    # parquet instead of re-running the per-iteration join jobs.
    labels = stored_doc_components(docs).select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    sizes = labels.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        labels.join(sizes, on="cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            (F.lit(1.0) / F.col("cluster_size")).alias("weight"),
        )
        .orderBy("doc_id")
    )
