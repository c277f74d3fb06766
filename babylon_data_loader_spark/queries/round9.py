"""Round-9 queries: substring-level exact dedup (Lee et al.
ExactSubstr style) and the language-axis corpus split — the two
families the r8 review named as the remaining dedup/curation gaps.

- ``q_substring_dedup``: per-source share of stride-1 16-token window
  hashes that repeat corpus-wide — copied >=16-token spans inside
  otherwise-distinct documents, invisible to document-level exact AND
  near dedup (and finer than the 32-token non-overlapping chunks of
  ``q_chunk_dedup_rate``: stride 1 catches spans chunk boundaries
  split).
- ``q_dup_span_docs``: the 20 documents with the highest duplicated-
  window fraction — the strip-or-drop worklist substring dedup
  produces.
- ``q_substring_provenance``: duplicated windows bucketed by how many
  DISTINCT sources share them — breadth 1 is within-source re-crawl /
  internal repetition, breadth 2+ is cross-source republication or
  shared boilerplate.
- ``q_dup_span_lengths``: histogram of MAXIMAL duplicated-span
  lengths — consecutive duplicated window positions merged by
  gaps-and-islands, recovering true span lengths from the 16-token
  lower bound.
- ``q_dup_span_coverage``: per-source fraction of token positions
  inside some duplicated span — the exact interval UNION: islands
  whose token extents [lo, hi+15] overlap are merged before summing
  (``_merged_token_spans``), so no double counting and coverage
  <= 1.0 — the headline "X% of the corpus is duplicated substring"
  statistic.
- ``q_substring_strip``: the STRIP step itself — duplicated-span
  token positions removed per document, digests + before/after
  counts (the aggressive both-copies preview).
- ``q_dedup_adjusted_budget``: token budgeting on deduplicated
  masses — effective tokens = raw − span-covered, so boilerplate
  volume cannot buy epochs.
- ``q_lang_split``: the per-language corpus split with cross-lingual
  dedup impact — for each language: docs, tokens, and what collapsing
  verified cross-language near-dup pairs (translation / template
  localization, the q_cross_lingual_dup signal) would remove. This is
  what makes that bucket signal ACTIONABLE: the split quantifies the
  per-locale token cost before a pipeline decides to dedup across
  languages.
- ``q_lang_dup_matrix``: WHO translates WHOM — every verified
  near-dup pair attributed directionally (smaller doc_id = owner, the
  q_ngram_novelty acquisition-order convention) into a lang x lang
  matrix with distinct-loser counts.
- ``q_token_budget_by_lang``: language-balanced token budgeting — a
  1x-corpus budget where each language contributes up to 4 epochs of
  its own tokens, capped at 40% of the budget so no language
  dominates the mixture. Pure BIGINT floor arithmetic.

Scale notes: the window table is corpus-token-scale and lives behind
the at-rest store (operators/dedup.py::stored_token_windows, built
once per dataset version); every consumer is a hash-keyed
map-combinable aggregate and nothing wider than (id, 32-hex hash)
shuffles. The language split reads the at-rest verified-pair store
and joins bare ids onto a two-column (doc_id, lang) projection; the
budget queries are one token aggregate plus a single-row broadcast.
Numerics: integer counts with BIGINT-cast oracle sums (the HUGEINT
lesson, tests/test_oracle_types.py), one unrounded double division
per ratio, deterministic orderings with id tiebreaks.

Reference analogue: none (the reference is a CSV->Mongo ETL loader,
SURVEY.md §3) — LLM-pipeline track extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from babylon_data_loader_spark.functions.cache import persist_tracked
from babylon_data_loader_spark.functions.text import tokens
from babylon_data_loader_spark.queries import query
from babylon_data_loader_spark.queries.round7 import _PAIRS_WITH_J_CTE
from babylon_data_loader_spark.schemas import load_table

_TOK = r"regexp_split_to_array(trim(lower(text)), '\s+')"

#: stride-1 16-token window hashes per document — the DuckDB twin of
#: operators/dedup.py::token_windows (md5 over the space-joined
#: window; whole-doc fallback below 16 tokens). DuckDB list slicing
#: t[j:j+15] is 1-based inclusive = 16 elements, matching Spark's
#: slice(t, j+1, 16).
_WIN_CTE = f"""
    WITH tokd AS (
      SELECT doc_id, source, {_TOK} AS t FROM documents
    ), w AS (
      SELECT doc_id, source,
             unnest(CASE WHEN len(t) >= 16
               THEN list_transform(generate_series(1, len(t) - 15),
                      j -> md5(array_to_string(t[j:j+15], ' ')))
               ELSE [md5(array_to_string(t, ' '))] END) AS h
      FROM tokd
    )
"""


def _windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, h) window-hash table through the at-rest store,
    persisted for the query's duration (every consumer reads it at
    least twice: once for the duplicate set, once for attribution).
    pos is -1 for the whole-doc fallback window of sub-16-token
    documents — span consumers filter it, rate consumers keep it."""
    from babylon_data_loader_spark.operators.dedup import (
        stored_token_windows,
    )

    docs = load_table(spark, sf_dir, "documents")
    return persist_tracked(
        stored_token_windows(docs).select(
            F.col("_id").alias("doc_id"),
            F.col("_pos").alias("pos"),
            F.col("_h").alias("h"),
        )
    )


@query(
    "q_substring_dedup",
    oracle=_WIN_CTE
    + """
    , dup AS (
      SELECT h FROM w GROUP BY h HAVING COUNT(*) > 1
    )
    SELECT w.source,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_windows,
           CAST(SUM(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS dup_rate
    FROM w LEFT JOIN dup d ON d.h = w.h
    GROUP BY w.source ORDER BY w.source
    """,
)
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source substring-duplication rate: the share of stride-1
    16-token window hashes that occur MORE THAN ONCE corpus-wide —
    the ExactSubstr dedup signal (Lee et al. 2022) at source
    granularity. The duplicate set is one hash-keyed map-combinable
    aggregate over the at-rest window store; attribution is a
    hash-partitioned join carrying (hash, source) only. At 100 TB the
    dup set is bounded by distinct repeated spans (vocabulary-scale
    relative to the corpus), the same shape q_chunk_dedup_rate
    already proved out at stride 32."""
    docs = load_table(spark, sf_dir, "documents")
    win = _windows(spark, sf_dir)
    dup = (
        win.groupBy("h")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > 1)
        .select("h", F.lit(1).alias("_d"))
    )
    src = docs.select("doc_id", "source")
    return (
        win.join(dup, "h", "left")
        .join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.coalesce(F.sum("_d"), F.lit(0))
            .cast("long")
            .alias("n_dup_windows"),
            (
                F.coalesce(F.sum("_d"), F.lit(0)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


@query(
    "q_dup_span_docs",
    oracle=_WIN_CTE
    + """
    , dup AS (
      SELECT h FROM w GROUP BY h HAVING COUNT(*) > 1
    ), per AS (
      SELECT w.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_windows,
             CAST(SUM(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_dup_windows
      FROM w LEFT JOIN dup d ON d.h = w.h
      GROUP BY w.doc_id
    )
    SELECT doc_id, n_windows, n_dup_windows,
           CAST(n_dup_windows AS DOUBLE) / n_windows AS dup_frac
    FROM per
    ORDER BY CAST(n_dup_windows AS DOUBLE) / n_windows DESC, doc_id
    LIMIT 20
    """,
)
def q_dup_span_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 20 documents most covered by duplicated 16-token windows —
    substring dedup's strip-or-drop worklist (a doc near frac 1.0 is
    wholly assembled from spans that exist elsewhere). Per-doc counts
    are one map-combinable aggregate; the top-k is a TakeOrdered with
    a doc_id tiebreak, never a global sort."""
    win = _windows(spark, sf_dir)
    dup = (
        win.groupBy("h")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > 1)
        .select("h", F.lit(1).alias("_d"))
    )
    per = (
        win.join(dup, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.coalesce(F.sum("_d"), F.lit(0))
            .cast("long")
            .alias("n_dup_windows"),
        )
    )
    return (
        per.select(
            "doc_id",
            "n_windows",
            "n_dup_windows",
            (
                F.col("n_dup_windows").cast("double")
                / F.col("n_windows").cast("double")
            ).alias("dup_frac"),
        )
        .orderBy(F.col("dup_frac").desc(), F.col("doc_id").asc())
        .limit(20)
    )


@query(
    "q_substring_provenance",
    oracle=_WIN_CTE
    + """
    , agg AS (
      SELECT h,
             CAST(COUNT(*) AS BIGINT) AS occ,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
      FROM w GROUP BY h HAVING COUNT(*) > 1
    )
    SELECT n_sources,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(occ) AS BIGINT) AS n_occurrences
    FROM agg GROUP BY n_sources ORDER BY n_sources
    """,
)
def q_substring_provenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Duplicated windows bucketed by source breadth: how many
    DISTINCT sources share each repeated 16-token span. Breadth 1 is
    within-source re-crawl or internal repetition (strip locally);
    breadth 2+ is cross-source republication or shared boilerplate
    (strip globally). Two hash-keyed aggregates over the window
    store; output is O(|sources|) rows."""
    docs = load_table(spark, sf_dir, "documents")
    win = _windows(spark, sf_dir)
    src = docs.select("doc_id", "source")
    agg = (
        win.join(src, "doc_id")
        .groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("occ"),
            F.countDistinct("source").alias("n_sources"),
        )
        .where(F.col("occ") > 1)
    )
    return (
        agg.groupBy("n_sources")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum("occ").cast("long").alias("n_occurrences"),
        )
        .orderBy("n_sources")
    )


#: positioned windows over >=16-token documents plus their maximal
#: duplicated-span islands (classic gaps-and-islands: consecutive
#: duplicated positions grouped by pos - row_number). Span consumers
#: exclude the whole-doc fallback windows (pos = -1) by construction.
_WIN_POS_ISLANDS_CTE = f"""
    WITH tokd AS (
      SELECT doc_id, source, {_TOK} AS t FROM documents
    ), w AS (
      SELECT doc_id, source, u['pos'] AS pos, u['h'] AS h FROM (
        SELECT doc_id, source,
               unnest(list_transform(generate_series(1, len(t) - 15),
                 j -> {{'pos': j - 1,
                        'h': md5(array_to_string(t[j:j+15], ' '))}}))
                 AS u
        FROM tokd WHERE len(t) >= 16
      )
    ), dup AS (
      SELECT h FROM w GROUP BY h HAVING COUNT(*) > 1
    ), isl AS (
      SELECT doc_id, source,
             CAST(MIN(pos) AS BIGINT) AS lo,
             CAST(MAX(pos) AS BIGINT) AS hi
      FROM (
        SELECT w.doc_id, w.source, w.pos,
               w.pos - ROW_NUMBER() OVER (
                 PARTITION BY w.doc_id ORDER BY w.pos) AS g
        FROM w JOIN dup d ON d.h = w.h
      ) GROUP BY doc_id, source, g
    )
"""


def _dup_span_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lo, hi) maximal duplicated-span islands per document
    (>=16-token docs only): consecutive duplicated window positions
    merged, so [lo, hi+15] is a maximal token span every piece of
    which repeats corpus-wide. The per-doc Window is partitioned by
    doc_id (data-scale cardinality — one task never sees more than
    one document's positions)."""
    from pyspark.sql import Window

    win = _windows(spark, sf_dir).where(F.col("pos") >= 0)
    dup = (
        win.groupBy("h")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > 1)
        .select("h")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        win.join(dup, "h")
        .select("doc_id", "pos")
        .withColumn("_g", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "_g")
        .agg(
            F.min("pos").cast("long").alias("lo"),
            F.max("pos").cast("long").alias("hi"),
        )
        .drop("_g")
    )


def _merged_cte_sql(src: str, name: str) -> str:
    """Interval-merge CTE over a (doc_id, source, lo, hi) island
    table. An island's token extent is [lo, hi+15], so two islands
    whose WINDOW positions are 1-15 apart still overlap in tokens
    (dup windows at positions 0 and 10 only cover 26 tokens, not 32).
    Classic interval merge: per doc, in lo order, a new group starts
    when lo clears the running max hi by more than 15; the merged
    intervals are pairwise token-disjoint, so SUM(hi - lo + 16) is
    the exact interval-union length. Shared with round10's
    loser-island variant."""
    return f"""
    , {name} AS (
      SELECT doc_id, source,
             CAST(MIN(lo) AS BIGINT) AS lo,
             CAST(MAX(hi) AS BIGINT) AS hi
      FROM (
        SELECT doc_id, source, lo, hi,
               SUM(CASE WHEN prev_hi IS NULL OR lo > prev_hi + 15
                        THEN 1 ELSE 0 END)
                 OVER (PARTITION BY doc_id ORDER BY lo) AS mg
        FROM (
          SELECT doc_id, source, lo, hi,
                 MAX(hi) OVER (PARTITION BY doc_id ORDER BY lo
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING) AS prev_hi
          FROM {src}
        )
      ) GROUP BY doc_id, source, mg
    )
"""


_MERGED_CTE = _merged_cte_sql("isl", "mrg")


def merge_token_extents(isl: DataFrame) -> DataFrame:
    """(doc_id, lo, hi) islands merged wherever their TOKEN extents
    [lo, hi+15] overlap (next.lo <= prev.hi + 15): the output
    intervals are pairwise token-disjoint per doc, so summing
    hi - lo + 16 computes the exact union of duplicated token
    positions — never double-counting windows 1-15 positions apart.
    Same per-doc Window partitioning as the islands themselves (the
    running-max + cumulative-flag interval merge reuses the one
    doc_id sort)."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("lo")
    prev_hi = F.max("hi").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        isl.withColumn("_ph", prev_hi)
        .withColumn(
            "_new",
            F.when(
                F.col("_ph").isNull()
                | (F.col("lo") > F.col("_ph") + F.lit(15)),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("_mg", F.sum("_new").over(w))
        .groupBy("doc_id", "_mg")
        .agg(
            F.min("lo").cast("long").alias("lo"),
            F.max("hi").cast("long").alias("hi"),
        )
        .drop("_mg")
    )


def _merged_token_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide duplicated-span islands through the token-extent
    interval merge — the exact-union frame coverage and budget
    consumers sum."""
    return merge_token_extents(_dup_span_islands(spark, sf_dir))


@query(
    "q_dup_span_lengths",
    oracle=_WIN_POS_ISLANDS_CTE
    + """
    SELECT CAST(hi - lo + 16 AS BIGINT) AS span_len,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM isl GROUP BY hi - lo + 16 ORDER BY span_len
    """,
)
def q_dup_span_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of MAXIMAL duplicated-span lengths (tokens): window
    hashes only lower-bound duplication at 16 tokens; merging
    consecutive duplicated positions (gaps-and-islands over the
    positioned window store) recovers the true span lengths — the
    distribution Lee et al. report for ExactSubstr dedup. A 200-token
    span shows up here as one 200-token island, not 185 anonymous
    windows. Islands are per-doc-partitioned window arithmetic plus
    one grouped min/max; output is O(distinct lengths)."""
    isl = _dup_span_islands(spark, sf_dir)
    return (
        isl.select(
            (F.col("hi") - F.col("lo") + F.lit(16))
            .cast("long")
            .alias("span_len"),
            "doc_id",
        )
        .groupBy("span_len")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy("span_len")
    )


@query(
    "q_dup_span_coverage",
    oracle=_WIN_POS_ISLANDS_CTE
    + _MERGED_CTE
    + """
    , per AS (
      SELECT doc_id, source,
             CAST(SUM(hi - lo + 16) AS BIGINT) AS covered
      FROM mrg GROUP BY doc_id, source
    ), tot AS (
      SELECT source,
             CAST(SUM(len(t)) AS BIGINT) AS total_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM tokd WHERE len(t) >= 16 GROUP BY source
    )
    SELECT t.source, t.n_docs, t.total_tokens,
           CAST(COALESCE(SUM(p.covered), 0) AS BIGINT)
             AS covered_tokens,
           CAST(COALESCE(SUM(p.covered), 0) AS DOUBLE)
             / t.total_tokens AS coverage
    FROM tot t LEFT JOIN per p ON p.source = t.source
    GROUP BY t.source, t.n_docs, t.total_tokens
    ORDER BY t.source
    """,
)
def q_dup_span_coverage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source duplicated-substring COVERAGE: the fraction of
    token positions lying inside some maximal duplicated span — the
    headline "X% of the corpus is duplicated substring" number of
    ExactSubstr dedup. Islands are first re-merged on TOKEN-extent
    overlap (_merged_token_spans), so two islands 1-15 window
    positions apart — whose [lo, hi+15] token extents intersect —
    count their union once, never twice: covered_tokens is the exact
    interval-union size and coverage can never exceed 1.0 (it equals
    q_substring_strip's per-position removal count by construction).
    Restricted to >=16-token documents on both sides of the ratio.
    The denominator is one token-count aggregate over the documents
    scan."""
    from babylon_data_loader_spark.functions.text import tokens as _tk

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        "source",
        F.size(_tk(F.lower(F.col("text")))).cast("long").alias("_nt"),
    ).where(F.col("_nt") >= 16)
    isl = _merged_token_spans(spark, sf_dir)
    per = isl.groupBy("doc_id").agg(
        F.sum(F.col("hi") - F.col("lo") + F.lit(16))
        .cast("long")
        .alias("covered")
    )
    return (
        sized.join(per, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nt").cast("long").alias("total_tokens"),
            F.coalesce(F.sum("covered"), F.lit(0))
            .cast("long")
            .alias("covered_tokens"),
            (
                F.coalesce(F.sum("covered"), F.lit(0)).cast("double")
                / F.sum("_nt").cast("double")
            ).alias("coverage"),
        )
        .orderBy("source")
    )


@query(
    "q_substring_strip",
    oracle=_WIN_POS_ISLANDS_CTE
    + """
    , sp AS (
      SELECT doc_id, list({'lo': lo, 'hi': hi}) AS spans
      FROM isl GROUP BY doc_id
    ), joined AS (
      SELECT b.doc_id, b.t,
             COALESCE(s.spans,
                      CAST([] AS STRUCT(lo BIGINT, hi BIGINT)[]))
               AS spans
      FROM (SELECT doc_id, t FROM tokd WHERE len(t) >= 16) b
      LEFT JOIN sp s USING (doc_id)
    ), stripped AS (
      SELECT doc_id, t,
             list_filter(t, (x, i) ->
               len(list_filter(spans, s ->
                 s.lo <= i - 1 AND i - 1 <= s.hi + 15)) = 0) AS kept
      FROM joined
    )
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_before,
           CAST(len(kept) AS BIGINT) AS n_after,
           CASE WHEN len(kept) = 0 THEN NULL
                ELSE md5(array_to_string(kept, ' ')) END AS digest
    FROM stripped ORDER BY doc_id
    """,
)
def q_substring_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STRIP step of ExactSubstr dedup: remove every token
    position lying inside a maximal duplicated span and emit the
    per-document before/after token counts plus an md5 digest of the
    stripped text (digest, not the text itself, so output width stays
    constant at any document size). This is the aggressive both-copies
    preview — an upper bound on removal; production pipelines keep one
    owner copy per span, which composes from q_lang_dup_matrix-style
    ownership. Token filtering is one indexed-lambda projection per
    doc against its own O(islands) span list (broadcast-free: the
    span list rides a doc_id-keyed join); >=16-token docs only."""
    docs = load_table(spark, sf_dir, "documents")
    return strip_by_islands(
        docs, _dup_span_islands(spark, sf_dir)
    ).orderBy("doc_id")


def strip_by_islands(docs: DataFrame, isl: DataFrame) -> DataFrame:
    """(doc_id, n_before, n_after, digest): remove every token
    position of each >=16-token document lying inside some island's
    token extent [lo, hi+15] and digest what survives. The membership
    test is a per-position union over the doc's own O(islands) span
    list (broadcast-free: the list rides a doc_id-keyed join), so
    overlapping extents never double-remove. Shared by the both-copies
    preview (q_substring_strip) and round10's owner-keep strip — the
    policies differ only in WHICH islands they pass in."""
    from babylon_data_loader_spark.functions.text import tokens as _tk

    base = docs.select(
        "doc_id", _tk(F.lower(F.col("text"))).alias("_t")
    ).where(F.size("_t") >= 16)
    spans = isl.groupBy("doc_id").agg(
        F.collect_list(F.struct("lo", "hi")).alias("_spans")
    )
    empty = F.array().cast("array<struct<lo:bigint,hi:bigint>>")
    joined = base.join(spans, "doc_id", "left").withColumn(
        "_spans", F.coalesce(F.col("_spans"), empty)
    )
    kept = F.filter(
        F.col("_t"),
        lambda x, i: ~F.exists(
            F.col("_spans"),
            lambda s: (s["lo"] <= i) & (i <= s["hi"] + F.lit(15)),
        ),
    )
    return joined.select(
        "doc_id",
        F.size("_t").cast("long").alias("n_before"),
        F.size(kept).cast("long").alias("n_after"),
        # a fully-stripped doc has NO digest (NULL on both
        # engines) rather than md5("")
        F.when(
            F.size(kept) > 0,
            F.md5(F.concat_ws(" ", kept).cast("binary")),
        ).alias("digest"),
    )


@query(
    "q_dedup_adjusted_budget",
    oracle=_WIN_POS_ISLANDS_CTE
    + _MERGED_CTE
    + """
    , cov AS (
      SELECT source, CAST(SUM(hi - lo + 16) AS BIGINT) AS covered
      FROM mrg GROUP BY source
    ), per AS (
      SELECT source, CAST(SUM(len(t)) AS BIGINT) AS nt
      FROM tokd GROUP BY source
    ), eff AS (
      SELECT p.source, p.nt,
             COALESCE(c.covered, 0) AS covered,
             p.nt - COALESCE(c.covered, 0) AS effective
      FROM per p LEFT JOIN cov c USING (source)
    ), tot AS (
      SELECT CAST(SUM(effective) AS BIGINT) AS budget FROM eff
    )
    SELECT e.source, e.nt AS n_tokens,
           CAST(e.covered AS BIGINT) AS covered_tokens,
           CAST(e.effective AS BIGINT) AS effective_tokens,
           CAST(2 * t.budget // 5 AS BIGINT) AS source_cap,
           CAST(LEAST(2 * t.budget // 5, 4 * e.effective)
                AS BIGINT) AS allocated
    FROM eff e, tot t ORDER BY e.source
    """,
)
def q_dedup_adjusted_budget(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Token budgeting on DEDUP-ADJUSTED masses: each source's
    effective tokens are its raw count minus the positions covered by
    duplicated spans (q_dup_span_coverage's numerator — the merged
    interval-UNION, so overlapping token extents never double-count
    and effective can never go negative), so a source whose volume is
    mostly republished boilerplate cannot buy epochs with it. Budget =
    the deduped corpus (1x), per-source cap = 40% anti-dominance, up
    to 4 epochs of effective tokens — the composition a curation
    pipeline actually schedules from. Pure BIGINT floor arithmetic
    over the merged-span frame + one single-row broadcast."""
    from babylon_data_loader_spark.functions.text import tokens as _tk

    docs = load_table(spark, sf_dir, "documents")
    src = docs.select("doc_id", "source")
    cov = (
        _merged_token_spans(spark, sf_dir)
        .join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.sum(F.col("hi") - F.col("lo") + F.lit(16))
            .cast("long")
            .alias("covered")
        )
    )
    per = (
        docs.select(
            "source",
            F.size(_tk(F.lower(F.col("text"))))
            .cast("long")
            .alias("_nt"),
        )
        .groupBy("source")
        .agg(F.sum("_nt").cast("long").alias("nt"))
    )
    eff = persist_tracked(
        per.join(cov, "source", "left").select(
            "source",
            "nt",
            F.coalesce("covered", F.lit(0))
            .cast("long")
            .alias("covered"),
            (
                F.col("nt")
                - F.coalesce("covered", F.lit(0)).cast("long")
            ).alias("effective"),
        )
    )
    tot = eff.agg(F.sum("effective").cast("long").alias("budget"))
    cap = F.expr("2 * budget div 5")
    return (
        eff.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("nt").alias("n_tokens"),
            F.col("covered").alias("covered_tokens"),
            F.col("effective").alias("effective_tokens"),
            cap.alias("source_cap"),
            F.least(cap, F.lit(4) * F.col("effective")).alias(
                "allocated"
            ),
        )
        .orderBy("source")
    )


@query(
    "q_lang_split",
    oracle=_PAIRS_WITH_J_CTE
    + f"""
    , losers AS (
      SELECT DISTINCT GREATEST(p.doc_a, p.doc_b) AS doc_id
      FROM pairs p
      JOIN documents da ON da.doc_id = p.doc_a
      JOIN documents db ON db.doc_id = p.doc_b
      WHERE da.lang <> db.lang
    )
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len({_TOK})) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_lost,
           CAST(SUM(CASE WHEN l.doc_id IS NOT NULL
                    THEN len({_TOK}) ELSE 0 END)
                AS BIGINT) AS tokens_lost,
           CAST(SUM(len({_TOK}))
                - SUM(CASE WHEN l.doc_id IS NOT NULL
                      THEN len({_TOK}) ELSE 0 END)
                AS BIGINT) AS tokens_retained
    FROM documents d LEFT JOIN losers l ON l.doc_id = d.doc_id
    GROUP BY d.lang ORDER BY d.lang
    """,
)
def q_lang_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-language corpus split with cross-lingual dedup impact:
    for each language, document and token totals plus what collapsing
    verified CROSS-language near-dup pairs would remove (the loser is
    the larger doc_id — the q_ngram_novelty acquisition-order
    convention; DISTINCT losers so multiply-matched docs count once).
    This turns q_cross_lingual_dup's bucket counts into the per-locale
    token bill a pipeline weighs before deduplicating across
    languages. One read of the at-rest pair store, two id-keyed joins
    onto a (doc_id, lang) projection, one grouped integer aggregate."""
    from babylon_data_loader_spark.operators.dedup import (
        stored_verified_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    lang = docs.select("doc_id", "lang")
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
        .withColumn("_lost", F.lit(1))
    )
    per_doc = docs.select(
        "doc_id",
        "lang",
        F.size(tokens(F.lower(F.col("text"))))
        .cast("long")
        .alias("_nt"),
    )
    lost_nt = F.sum(
        F.when(F.col("_lost").isNotNull(), F.col("_nt")).otherwise(
            F.lit(0)
        )
    ).cast("long")
    return (
        per_doc.join(losers, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nt").cast("long").alias("n_tokens"),
            F.coalesce(F.sum("_lost"), F.lit(0))
            .cast("long")
            .alias("n_docs_lost"),
            lost_nt.alias("tokens_lost"),
            (F.sum("_nt").cast("long") - lost_nt).alias(
                "tokens_retained"
            ),
        )
        .orderBy("lang")
    )


@query(
    "q_lang_dup_matrix",
    oracle=_PAIRS_WITH_J_CTE
    + """
    , lp AS (
      SELECT CASE WHEN p.doc_a < p.doc_b THEN da.lang
                  ELSE db.lang END AS owner_lang,
             CASE WHEN p.doc_a < p.doc_b THEN db.lang
                  ELSE da.lang END AS loser_lang,
             GREATEST(p.doc_a, p.doc_b) AS loser_id
      FROM pairs p
      JOIN documents da ON da.doc_id = p.doc_a
      JOIN documents db ON db.doc_id = p.doc_b
    )
    SELECT owner_lang, loser_lang,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT loser_id) AS BIGINT) AS n_losers
    FROM lp GROUP BY owner_lang, loser_lang
    ORDER BY owner_lang, loser_lang
    """,
)
def q_lang_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHO translates WHOM: every verified near-dup pair attributed
    directionally (smaller doc_id = owner) into a language x language
    matrix — the diagonal is same-locale re-crawl, off-diagonal cells
    are translation / template-localization flows, with distinct
    loser counts per cell. Same at-rest-pair-store + two-join shape
    as q_source_dedup_matrix; |langs|^2 metadata-scale output."""
    from babylon_data_loader_spark.operators.dedup import (
        stored_verified_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    lang = docs.select("doc_id", "lang")
    pairs = stored_verified_pairs(docs).select("doc_a", "doc_b")
    lo_is_a = F.col("doc_a") < F.col("doc_b")
    return (
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
        .select(
            F.when(lo_is_a, F.col("_la"))
            .otherwise(F.col("_lb"))
            .alias("owner_lang"),
            F.when(lo_is_a, F.col("_lb"))
            .otherwise(F.col("_la"))
            .alias("loser_lang"),
            F.greatest("doc_a", "doc_b").alias("loser_id"),
        )
        .groupBy("owner_lang", "loser_lang")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("loser_id").alias("n_losers"),
        )
        .orderBy("owner_lang", "loser_lang")
    )


@query(
    "q_token_budget_by_lang",
    oracle=f"""
    WITH per AS (
      SELECT lang, CAST(SUM(len({_TOK})) AS BIGINT) AS nt
      FROM documents GROUP BY lang
    ), tot AS (
      SELECT CAST(SUM(nt) AS BIGINT) AS total FROM per
    )
    SELECT p.lang, p.nt AS n_tokens,
           CAST(2 * t.total // 5 AS BIGINT) AS lang_cap,
           CAST(LEAST(2 * t.total // 5, 4 * p.nt) AS BIGINT)
             AS allocated,
           CAST(LEAST(2 * t.total // 5, 4 * p.nt) * 100 // t.total
                AS BIGINT) AS budget_pct
    FROM per p, tot t
    ORDER BY p.lang
    """,
)
def q_token_budget_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Language-balanced token budgeting: a 1x-corpus budget where
    each language contributes up to 4 epochs of its own tokens but
    never more than 40% of the budget (the anti-dominance cap a
    multilingual mixture schedule applies so the head language cannot
    crowd out the tail). All BIGINT floor arithmetic (`div` on
    positives) — no ratio can diverge between engines; shares are
    integer percent. One token aggregate plus a single-row
    broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    per = (
        docs.select(
            "lang",
            F.size(tokens(F.lower(F.col("text"))))
            .cast("long")
            .alias("_t"),
        )
        .groupBy("lang")
        .agg(F.sum("_t").cast("long").alias("nt"))
    )
    per = persist_tracked(per)
    tot = per.agg(F.sum("nt").cast("long").alias("total"))
    cap = F.expr("2 * total div 5")
    alloc = F.least(cap, F.lit(4) * F.col("nt"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            F.col("nt").alias("n_tokens"),
            cap.alias("lang_cap"),
            alloc.alias("allocated"),
            F.expr(
                "least(2 * total div 5, 4 * nt) * 100 div total"
            ).alias("budget_pct"),
        )
        .orderBy("lang")
    )
