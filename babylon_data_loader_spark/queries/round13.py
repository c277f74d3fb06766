"""Round-13 query: the language-gated budget admission pipeline
(r12 VERDICT ask #7).

``q_language_gate`` composes three oracle-green operator families
into the per-locale admission gate a multilingual curation pipeline
runs before scheduling a training mixture:

1. SPLIT + CROSS-LINGUAL DEDUP (q_lang_split's machinery): every
   verified near-dup pair whose two docs carry DIFFERENT languages
   drops its larger-doc_id member (translation / template-
   localization duplicates — the acquisition-order loser convention).
2. PER-LANGUAGE BUDGET (q_token_budget_by_lang's arithmetic): over
   the RETAINED corpus, each language's admission cap is the
   anti-dominance budget ``total_tokens div 5`` — 20% of the
   post-dedup corpus, which binds on the head language (en carries
   37-43% of tokens in this corpus) and leaves the tail languages
   unconstrained. Pure positive-integer floor division: no ratio can
   diverge between engines.
3. ADMIT (the token-budget family's grouped prefix scan): docs are
   admitted greedily per language in doc_id (acquisition) order
   while the running token sum stays within the language's cap.

Emits one row per ADMITTED doc with its language's running totals
and cap, plus the gate census (corpus size, cross-lingual losers
dropped) as scalar witness columns.

Scale shape: one read of the at-rest verified-pair store + one read
of the shared normalized-token store (tokenization and pair
verification are both train-once structures — nothing here rescans
text); the loser set is id-keyed joins; the admit stage is the
distributed grouped prefix scan (operators/rank.py), not a
per-language single-task window; the per-language totals (|langs|
rows) broadcast.

Reference analogue: none (the reference is a CSV→Mongo ETL loader) —
LLM-pipeline track extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from babylon_data_loader_spark.functions.cache import persist_tracked
from babylon_data_loader_spark.queries import query
from babylon_data_loader_spark.queries.round7 import _PAIRS_WITH_J_CTE
from babylon_data_loader_spark.schemas import load_table

_NT = r"CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT)"


@query(
    "q_language_gate",
    oracle=_PAIRS_WITH_J_CTE
    + f"""
    , losers AS (
      SELECT DISTINCT GREATEST(p.doc_a, p.doc_b) AS doc_id
      FROM pairs p
      JOIN documents da ON da.doc_id = p.doc_a
      JOIN documents db ON db.doc_id = p.doc_b
      WHERE da.lang <> db.lang
    ), ret AS (
      SELECT d.doc_id, d.lang, {_NT} AS nt
      FROM documents d LEFT JOIN losers l ON l.doc_id = d.doc_id
      WHERE l.doc_id IS NULL
    ), per AS (
      SELECT lang, CAST(SUM(nt) AS BIGINT) AS lang_total
      FROM ret GROUP BY lang
    ), tot AS (
      SELECT CAST(SUM(lang_total) AS BIGINT) AS total FROM per
    ), cum AS (
      SELECT lang, doc_id, nt,
             CAST(SUM(nt) OVER (
               PARTITION BY lang ORDER BY doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_tokens
      FROM ret
    ), census AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents)
               AS n_corpus,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM losers) AS n_lost
    )
    SELECT c.lang, c.doc_id, c.nt AS n_tokens, c.cum_tokens,
           CAST(t.total // 5 AS BIGINT) AS lang_cap,
           p.lang_total, census.n_corpus, census.n_lost
    FROM cum c JOIN per p USING (lang)
    CROSS JOIN tot t CROSS JOIN census
    WHERE c.cum_tokens <= t.total // 5
    ORDER BY c.lang, c.doc_id
    """,
)
def q_language_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-gated budget admission: cross-lingual near-dup losers
    dropped, then greedy per-language admission in acquisition order
    under the 20% anti-dominance token cap (see module docstring).
    Every retrieval decision is md5-derived integer arithmetic or
    integer floor division, so the DuckDB oracle recomputes the
    whole gate — pairs, losers, caps, running sums — exactly."""
    return language_gate(load_table(spark, sf_dir, "documents"))


def language_gate(docs: DataFrame) -> DataFrame:
    """The gate composition over any (doc_id, lang, text) frame —
    split out so a planted fixture can drive all three stages
    (tests/test_round13.py)."""
    from babylon_data_loader_spark.operators.dedup import (
        stored_verified_pairs,
    )
    from babylon_data_loader_spark.operators.index_store import (
        stored_norm_tokens,
    )
    from babylon_data_loader_spark.operators.rank import (
        grouped_running_totals_with_input,
    )

    lang = docs.select("doc_id", "lang")

    # stage 1: cross-lingual dedup — losers from the at-rest verified
    # pair store (two id-keyed joins onto the (doc_id, lang)
    # projection; the pair store is metadata-scale next to the corpus)
    pairs = stored_verified_pairs(docs).select("doc_a", "doc_b")
    losers = (
        pairs.join(
            lang.select(
                F.col("doc_id").alias("doc_a"),
                F.col("lang").alias("_la"),
            ),
            "doc_a",
        )
        .join(
            lang.select(
                F.col("doc_id").alias("doc_b"),
                F.col("lang").alias("_lb"),
            ),
            "doc_b",
        )
        .where(F.col("_la") != F.col("_lb"))
        .select(F.greatest("doc_a", "doc_b").alias("doc_id"))
        .distinct()
    )
    losers = persist_tracked(losers)  # probed twice: anti-join + census

    # token counts ride the shared at-rest normalized-token store —
    # no text is re-tokenized in this lane
    per_doc = stored_norm_tokens(docs).select(
        "doc_id", F.size("tok").cast("long").alias("nt")
    )
    ret = persist_tracked(
        per_doc.join(lang, "doc_id")
        .join(losers, "doc_id", "left_anti")
        .select("lang", "doc_id", "nt")
    )

    # stage 3 is planned FIRST so its materialized scan input can
    # feed stage 2's totals: re-aggregating `ret` separately would
    # re-execute the store joins at action time once the admit
    # scan's offsets come from the range-store sidecar (the r14
    # with_input contract, operators/rank.py)
    cum, ret_mat = grouped_running_totals_with_input(
        ret,
        ["lang"],
        [F.col("doc_id").asc()],
        {"cum_tokens": F.col("nt")},
    )
    cum = cum.withColumn("cum_tokens", F.col("cum_tokens").cast("long"))

    # stage 2: per-language totals and the anti-dominance cap —
    # |langs| rows, broadcast everywhere they join
    per = ret_mat.groupBy("lang").agg(
        F.sum("nt").cast("long").alias("lang_total")
    )
    caps = (
        per.crossJoin(
            F.broadcast(
                per.agg(F.sum("lang_total").cast("long").alias("total"))
            )
        )
        .select(
            "lang",
            "lang_total",
            F.expr("total div 5").cast("long").alias("lang_cap"),
        )
    )

    census = (
        docs.agg(F.count(F.lit(1)).alias("n_corpus"))
        .crossJoin(losers.agg(F.count(F.lit(1)).alias("n_lost")))
    )
    return (
        cum.join(F.broadcast(caps), "lang")
        .where(F.col("cum_tokens") <= F.col("lang_cap"))
        .crossJoin(F.broadcast(census))
        .select(
            "lang",
            "doc_id",
            F.col("nt").alias("n_tokens"),
            "cum_tokens",
            "lang_cap",
            "lang_total",
            "n_corpus",
            "n_lost",
        )
        .orderBy("lang", "doc_id")
    )
