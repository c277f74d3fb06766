"""Round-10 queries: the three seams the r9 review named on the
ExactSubstr dedup family — the PRODUCTION owner-keep strip policy,
the incremental appended-batch probe against the at-rest window
store, and the end-to-end dedup->budget composition that schedules
epochs from STRIPPED (not merely measured) token masses.

- ``q_substring_strip_owner``: ExactSubstr strip with the production
  ownership policy (Lee et al. 2022 §3 keep-one semantics): for every
  duplicated 16-token window hash the occurrence with the minimal
  (doc_id, pos) — the q_lang_dup_matrix acquisition-order owner
  convention — SURVIVES; every other occurrence is a loser and its
  token extent is stripped from its document. q_substring_strip (the
  r9 both-copies preview) upper-bounds this: here exactly one copy of
  each duplicated span remains in the corpus.
- ``q_incremental_substring``: the streaming-shaped seam — an
  appended batch of NEW documents probed against the at-rest window
  store of the EXISTING corpus (hash semi-join, no store rebuild),
  emitting the batch's per-source duplication rate and how many batch
  docs a majority-duplicated flag would route to the strip worklist.
  Mirrors the reference's incremental-ingest contract — new files
  checked against existing lake state, never a full reload
  (/root/reference/datalake/client.go:45-76).
- ``q_dedup_budget_e2e``: the composition a curation pipeline
  actually schedules from — owner-keep strip removal feeding the
  4-epoch / 40%-cap token allocator, so each source's budgetable mass
  is what strip RETAINS. Differs from q_dedup_adjusted_budget, which
  debits every duplicated position on every copy (the both-copies
  measure): here the kept owner copies still count, so corpus-wide
  exactly one copy of each duplicated span is budgeted.

Scale notes: ownership is one hash-keyed map-combinable aggregate
(min(struct(doc_id, pos)) + count) over the at-rest window store —
the same shuffle shape as the r9 duplicate set, nothing wider than
(id, pos, 32-hex hash) moves; loser islands and the interval-union
merge are per-doc window arithmetic (one task never holds more than
one document's positions). The incremental probe never recomputes
corpus windows: the batch (the small side, by construction of
append-style ingest) is hashed in flight and semi-joined against the
store's distinct hashes. The budget tail is a grouped integer
aggregate plus a single-row broadcast.

Numerics: integer counts with BIGINT-cast oracle sums, one unrounded
double division per ratio, integer 2*hits >= windows for the
majority flag (no float threshold), BIGINT floor `div` on positive
budgets only, deterministic orderings with id tiebreaks.

Reference analogue: none beyond the incremental-ingest contract cited
above (the reference is a CSV->Mongo ETL loader, SURVEY.md §3) —
LLM-pipeline track extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from babylon_data_loader_spark.functions.cache import persist_tracked
from babylon_data_loader_spark.queries import query
from babylon_data_loader_spark.queries.round9 import (
    _TOK,
    _WIN_POS_ISLANDS_CTE,
    _merged_cte_sql,
    _windows,
    merge_token_extents,
    strip_by_islands,
)
from babylon_data_loader_spark.schemas import load_table

#: loser occurrences + their gaps-and-islands runs, appended after
#: _WIN_POS_ISLANDS_CTE (which provides tokd/w). Ownership of each
#: duplicated window hash goes to the minimal (doc_id, pos)
#: occurrence; rn > 1 occurrences are losers. lisl merges consecutive
#: loser WINDOW positions per doc (same construction as isl, over the
#: loser subset).
_LOSER_CTE = """
    , occ AS (
      SELECT doc_id, source, pos,
             ROW_NUMBER() OVER (
               PARTITION BY h ORDER BY doc_id, pos) AS rn,
             COUNT(*) OVER (PARTITION BY h) AS n
      FROM w
    ), lose AS (
      SELECT doc_id, source, pos FROM occ WHERE n > 1 AND rn > 1
    ), lisl AS (
      SELECT doc_id, source,
             CAST(MIN(pos) AS BIGINT) AS lo,
             CAST(MAX(pos) AS BIGINT) AS hi
      FROM (
        SELECT doc_id, source, pos,
               pos - ROW_NUMBER() OVER (
                 PARTITION BY doc_id ORDER BY pos) AS g
        FROM lose
      ) GROUP BY doc_id, source, g
    )
"""


def _loser_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lo, hi) maximal runs of LOSER window positions per
    document: every duplicated window hash keeps its minimal
    (doc_id, pos) occurrence as the owner; all other occurrences are
    losers whose extents get stripped. Ownership is one hash-keyed
    min(struct)+count aggregate over the at-rest window store (map-
    combinable — partial min/count at the mappers, same shuffle shape
    as the r9 duplicate set); the islands are per-doc window
    arithmetic over the loser subset only."""
    from pyspark.sql import Window

    win = _windows(spark, sf_dir).where(F.col("pos") >= 0)
    own = (
        win.groupBy("h")
        .agg(
            F.min(F.struct("doc_id", "pos")).alias("_o"),
            F.count(F.lit(1)).alias("_n"),
        )
        .where(F.col("_n") > 1)
        .select("h", "_o")
    )
    lose = (
        win.join(own, "h")
        .where(
            (F.col("doc_id") != F.col("_o")["doc_id"])
            | (F.col("pos") != F.col("_o")["pos"])
        )
        .select("doc_id", "pos")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        lose.withColumn("_g", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "_g")
        .agg(
            F.min("pos").cast("long").alias("lo"),
            F.max("pos").cast("long").alias("hi"),
        )
        .drop("_g")
    )


@query(
    "q_substring_strip_owner",
    oracle=_WIN_POS_ISLANDS_CTE
    + _LOSER_CTE
    + """
    , sp AS (
      SELECT doc_id, list({'lo': lo, 'hi': hi}) AS spans
      FROM lisl GROUP BY doc_id
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
def q_substring_strip_owner(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The PRODUCTION ExactSubstr strip: one owner copy of every
    duplicated span survives. Ownership per duplicated window hash
    goes to the minimal (doc_id, pos) occurrence (the
    q_lang_dup_matrix smaller-doc_id-owns convention, extended by pos
    for within-doc repeats); only LOSER occurrences' token extents
    are removed. The r9 q_substring_strip is this query's upper
    bound — it removes every copy. Token-level caveat (inherent to
    interval-union stripping, shared with the Lee et al. pipeline):
    a kept owner span can still lose tokens where a DIFFERENT hash's
    loser extent overlaps it in the same document — ownership is per
    window hash, removal is the per-doc union of loser extents.
    Emits per-doc before/after token counts + digest of the kept
    text (constant output width at any document size); >=16-token
    docs only, same universe as the preview."""
    docs = load_table(spark, sf_dir, "documents")
    return strip_by_islands(
        docs, _loser_islands(spark, sf_dir)
    ).orderBy("doc_id")


@query(
    "q_dedup_budget_e2e",
    oracle=_WIN_POS_ISLANDS_CTE
    + _LOSER_CTE
    + _merged_cte_sql("lisl", "lmrg")
    + """
    , rem AS (
      SELECT source, CAST(SUM(hi - lo + 16) AS BIGINT) AS removed
      FROM lmrg GROUP BY source
    ), per AS (
      SELECT source, CAST(SUM(len(t)) AS BIGINT) AS nt
      FROM tokd GROUP BY source
    ), eff AS (
      SELECT p.source, p.nt,
             COALESCE(r.removed, 0) AS removed,
             p.nt - COALESCE(r.removed, 0) AS effective
      FROM per p LEFT JOIN rem r USING (source)
    ), tot AS (
      SELECT CAST(SUM(effective) AS BIGINT) AS budget FROM eff
    )
    SELECT e.source, e.nt AS n_tokens,
           CAST(e.removed AS BIGINT) AS stripped_tokens,
           CAST(e.effective AS BIGINT) AS effective_tokens,
           CAST(2 * t.budget // 5 AS BIGINT) AS source_cap,
           CAST(LEAST(2 * t.budget // 5, 4 * e.effective)
                AS BIGINT) AS allocated
    FROM eff e, tot t ORDER BY e.source
    """,
)
def q_dedup_budget_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup->budget: epoch allocation over what owner-keep
    strip actually RETAINS. Per source, effective tokens = raw count
    minus the interval-UNION of loser extents (merge_token_extents
    over the loser islands — the exact number of positions
    q_substring_strip_owner deletes, pinned by test); budget = the
    stripped corpus (1x), per-source cap = 40% anti-dominance, up to
    4 epochs of effective tokens. Unlike q_dedup_adjusted_budget
    (which debits EVERY copy of a duplicated span — the measurement
    view), the kept owner copies still count here, so the allocator
    sees exactly one copy of each span corpus-wide. Sub-16-token
    documents are never strippable and contribute their raw counts.
    Pure BIGINT floor arithmetic + one single-row broadcast."""
    from babylon_data_loader_spark.functions.text import tokens as _tk

    docs = load_table(spark, sf_dir, "documents")
    src = docs.select("doc_id", "source")
    rem = (
        merge_token_extents(_loser_islands(spark, sf_dir))
        .join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.sum(F.col("hi") - F.col("lo") + F.lit(16))
            .cast("long")
            .alias("removed")
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
        per.join(rem, "source", "left").select(
            "source",
            "nt",
            F.coalesce("removed", F.lit(0))
            .cast("long")
            .alias("removed"),
            (
                F.col("nt")
                - F.coalesce("removed", F.lit(0)).cast("long")
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
            F.col("removed").alias("stripped_tokens"),
            F.col("effective").alias("effective_tokens"),
            cap.alias("source_cap"),
            F.least(cap, F.lit(4) * F.col("effective")).alias(
                "allocated"
            ),
        )
        .orderBy("source")
    )


#: deterministic append-batch split: every 23rd doc_id is "the new
#: batch", the rest are "the already-ingested corpus". Positive ids,
#: so % is engine-stable (C-style in both, equal on positives). 23 is
#: coprime to the testdata's source assignment (source = doc_id mod
#: 20), so the batch spans every source instead of aliasing onto one.
_BATCH_PRED = "doc_id % 23 = 0"
_CORPUS_PRED = "doc_id % 23 <> 0"


#: shared by the batch probe and its streaming twin — both must equal
#: the plain "batch windows vs distinct corpus hashes" aggregate.
_INCR_ORACLE = f"""
    WITH tokd AS (
      SELECT doc_id, source, {_TOK} AS t FROM documents
    ), cw AS (
      SELECT DISTINCT
             unnest(CASE WHEN len(t) >= 16
               THEN list_transform(generate_series(1, len(t) - 15),
                      j -> md5(array_to_string(t[j:j+15], ' ')))
               ELSE [md5(array_to_string(t, ' '))] END) AS h
      FROM tokd WHERE {_CORPUS_PRED}
    ), bw AS (
      SELECT doc_id,
             unnest(CASE WHEN len(t) >= 16
               THEN list_transform(generate_series(1, len(t) - 15),
                      j -> md5(array_to_string(t[j:j+15], ' ')))
               ELSE [md5(array_to_string(t, ' '))] END) AS h
      FROM tokd WHERE {_BATCH_PRED}
    ), hit AS (
      SELECT bw.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_w,
             CAST(SUM(CASE WHEN cw.h IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hit
      FROM bw LEFT JOIN cw ON cw.h = bw.h
      GROUP BY bw.doc_id
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_batch_docs,
           CAST(SUM(n_w) AS BIGINT) AS n_windows,
           CAST(SUM(n_hit) AS BIGINT) AS n_hit_windows,
           CAST(SUM(n_hit) AS DOUBLE) / SUM(n_w) AS hit_rate,
           CAST(SUM(CASE WHEN 2 * n_hit >= n_w THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_flagged
    FROM hit JOIN documents d USING (doc_id)
    GROUP BY d.source ORDER BY d.source
    """


@query("q_incremental_substring", oracle=_INCR_ORACLE)
def q_incremental_substring(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental ExactSubstr: probe an APPENDED batch of new
    documents against the at-rest window store of the existing
    corpus — the dedup family's streaming-shaped seam (the
    reference's incremental-ingest contract: new files against
    existing state, /root/reference/datalake/client.go:45-76). The
    corpus store is read, never rebuilt (hash-keyed at-rest parquet,
    built once per dataset version); the batch — the small side by
    construction of append-style ingest — is window-hashed IN FLIGHT
    and left-joined against the store's distinct hashes. Emits the
    per-source batch duplication rate plus how many batch docs are
    majority-duplicated (2*hits >= windows, integer-exact) — the
    routing signal that sends a mostly-copied new doc to the strip
    worklist instead of straight into the corpus. Fallback whole-doc
    windows participate (a sub-16-token exact twin of corpus text is
    still a duplicate)."""
    from babylon_data_loader_spark.operators.dedup import (
        stored_token_windows,
        token_windows,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus_hashes = (
        stored_token_windows(docs.where(_CORPUS_PRED))
        .select(F.col("_h").alias("h"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    batch_win = token_windows(docs.where(_BATCH_PRED)).select(
        F.col("_id").alias("doc_id"), F.col("_h").alias("h")
    )
    per_doc = (
        batch_win.join(corpus_hashes, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_w"),
            F.coalesce(F.sum("_hit"), F.lit(0))
            .cast("long")
            .alias("n_hit"),
        )
    )
    return (
        per_doc.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_batch_docs"),
            F.sum("n_w").cast("long").alias("n_windows"),
            F.sum("n_hit").cast("long").alias("n_hit_windows"),
            (
                F.sum("n_hit").cast("double")
                / F.sum("n_w").cast("double")
            ).alias("hit_rate"),
            F.sum(
                F.when(
                    F.lit(2) * F.col("n_hit") >= F.col("n_w"),
                    F.lit(1),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_docs_flagged"),
        )
        .orderBy("source")
    )


@query("q_stream_incremental_dedup", oracle=_INCR_ORACLE)
def q_stream_incremental_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q_incremental_substring's STREAMING twin: the appended batch
    arrives as a file STREAM (several micro-batches under
    AvailableNow) and each micro-batch's documents are window-hashed
    in flight and stream-STATIC left-joined against the at-rest
    corpus window store — the landing-zone shape where new corpus
    files are probed for duplication as they arrive, before
    admission. The join is stateless (static side is the stored hash
    set), so the sink is plain append parquet carrying one row per
    batch window with its hit flag; the per-source rates aggregate
    the sink afterwards and must equal the batch twin's oracle
    exactly, independent of micro-batch boundaries. State discipline
    at 100 TB: NO stream state at all — the corpus store is the
    state, at rest, refreshed per dataset version; a watermark-bound
    stateful formulation would cap what the probe can remember, which
    is exactly wrong for dedup against the full corpus."""
    import os
    import shutil
    import uuid

    from babylon_data_loader_spark.operators.dedup import (
        stored_token_windows,
        token_windows,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus_hashes = (
        stored_token_windows(docs.where(_CORPUS_PRED))
        .select(F.col("_h").alias("h"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    from babylon_data_loader_spark.operators.index_store import (
        warehouse_dir,
    )

    work = os.path.join(
        warehouse_dir(spark), f"_stream_incr_{uuid.uuid4().hex[:12]}"
    )
    src_dir = os.path.join(work, "src")
    out_dir = os.path.join(work, "out")
    docs.where(_BATCH_PRED).repartition(4).write.mode(
        "overwrite"
    ).parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    swin = token_windows(stream).select(
        F.col("_id").alias("doc_id"), F.col("_h").alias("h")
    )
    probed = swin.join(corpus_hashes, "h", "left").select(
        "doc_id", F.coalesce("_hit", F.lit(0)).alias("hit")
    )
    (
        probed.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    try:
        sunk = spark.read.parquet(out_dir)
        per_doc = sunk.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_w"),
            F.sum("hit").cast("long").alias("n_hit"),
        )
        final = (
            per_doc.join(docs.select("doc_id", "source"), "doc_id")
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_batch_docs"),
                F.sum("n_w").cast("long").alias("n_windows"),
                F.sum("n_hit").cast("long").alias("n_hit_windows"),
                (
                    F.sum("n_hit").cast("double")
                    / F.sum("n_w").cast("double")
                ).alias("hit_rate"),
                F.sum(
                    F.when(
                        F.lit(2) * F.col("n_hit") >= F.col("n_w"),
                        F.lit(1),
                    ).otherwise(F.lit(0))
                )
                .cast("long")
                .alias("n_docs_flagged"),
            )
            .orderBy("source")
        )
        rows = final.collect()
        out_schema = final.schema
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(rows, out_schema)


@query("q_tokwin_maintenance")  # rows-only: store file layout is not
# SQL-expressible. Self-certifying: asserts IN-QUERY that the
# incrementally-appended window store holds exactly a fresh full
# build's content and that the dup-hash probe partition-prunes.
def q_tokwin_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The window-store lifecycle a 100 TB corpus actually runs:
    write (the existing corpus, hash-prefix-partitioned) → APPEND (an
    ingest batch — O(batch tokens), one file per touched prefix, no
    rebuild: operators/dedup.py::append_token_windows) → probe (the
    strip worklist's by-hash lookup, partition-pruned to the probed
    prefixes). The query RAISES unless (a) the maintained store's
    content equals a fresh full build's content EXACTLY (per-doc
    window counts and per-doc xor-free hash checksums compared
    distributed-side, never collected), (b) the probe's physical plan
    carries a non-empty hp PartitionFilter, and (c) an empty append
    is a content no-op. Emits the metadata-scale lifecycle summary
    (one row per step). q_incremental_substring is this structure's
    read-side consumer; this witnesses the write side."""
    import os
    import shutil
    import uuid

    from babylon_data_loader_spark.operators.dedup import (
        append_token_windows,
        probe_token_windows,
        read_token_window_store,
        token_windows,
        write_token_window_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    from babylon_data_loader_spark.operators.index_store import (
        warehouse_dir,
    )

    work = os.path.join(
        warehouse_dir(spark), f"_tokwin_maint_{uuid.uuid4().hex[:12]}"
    )
    store = os.path.join(work, "store")
    try:
        write_token_window_store(docs.where(_CORPUS_PRED), store)
        append_token_windows(docs.where(_BATCH_PRED), store)

        def _digest(win) -> tuple[int, int]:
            # (n_rows, order-free checksum): sum over rows of the
            # first 15 hex chars (60 bits) of md5(doc||pos||hash),
            # DECIMAL(38,0)-summed so it is exact at any row count
            # and partitioning (a BIGINT sum would overflow/ANSI-throw
            # near 2^63/2^60 rows); no data row is ever collected
            row = win.select(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat_ws(
                                    "|", "_id", "_pos", "_h"
                                ).cast("binary")
                            ),
                            1,
                            15,
                        ),
                        16,
                        10,
                    )
                    .cast("long")
                    .cast("decimal(38,0)")
                ).alias("chk"),
            ).first()
            return int(row["n"]), int(row["chk"] or 0)

        maintained, meta = read_token_window_store(spark, store)
        got = _digest(maintained.select("_id", "_pos", "_h"))
        want = _digest(token_windows(docs))
        if got != want:
            raise AssertionError(
                f"append != rebuild: maintained {got} vs full {want}"
            )

        # probe the batch's first >=16-token doc's pos-0 window;
        # if the batch happens to hold none (all sub-16 docs), fall
        # back to the store's smallest hash — isin([]) would fold the
        # scan to an empty LocalRelation and spuriously fail the
        # PartitionFilters check (r10 review)
        probe_h = [
            r["_h"]
            for r in token_windows(docs.where(_BATCH_PRED))
            .where("_pos = 0")
            .orderBy("_id")
            .limit(1)
            .collect()
        ] or [
            r["_h"]
            for r in maintained.select("_h").orderBy("_h").limit(1).collect()
        ]
        if probe_h:
            probed = probe_token_windows(spark, store, probe_h)
            n_hits = probed.count()
            plan = (
                probed._jdf.queryExecution().executedPlan().toString()
            )
            if (
                "PartitionFilters: [" not in plan
                or "PartitionFilters: []" in plan
            ):
                raise AssertionError(
                    "probe scan carries no hp PartitionFilter"
                )
        else:  # empty documents table: nothing to probe
            n_hits = 0

        append_token_windows(docs.where("doc_id < 0"), store)
        if _digest(
            read_token_window_store(spark, store)[0].select(
                "_id", "_pos", "_h"
            )
        ) != got:
            raise AssertionError("empty append changed store content")

        def _count_files() -> int:
            return sum(
                f.endswith(".parquet")
                for _d, _s, fs in os.walk(store)
                for f in fs
            )

        n_files = _count_files()
        # COMPACT (the generic index compactor, operators/
        # index_store.py — the tokwin store is an hp-partitioned
        # index like any other): appends leave one extra file per
        # touched prefix per batch; compaction folds back to one file
        # per prefix with content and meta byte-identical
        from babylon_data_loader_spark.operators.index_store import (
            compact_index,
        )

        compact_index(spark, store, "hp")
        if _digest(
            read_token_window_store(spark, store)[0].select(
                "_id", "_pos", "_h"
            )
        ) != got:
            raise AssertionError("compact changed store content")
        n_files_compacted = _count_files()
        if n_files_compacted > n_files:
            raise AssertionError(
                f"compact grew the store: {n_files} -> "
                f"{n_files_compacted} files"
            )
        rows = [
            ("append_equals_rebuild", True, got[0], n_files),
            ("probe_partition_pruned", True, n_hits, n_files),
            ("empty_append_noop", True, got[0], n_files),
            (
                "compact_content_identical",
                True,
                got[0],
                n_files_compacted,
            ),
        ]
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        rows, "step STRING, ok BOOLEAN, n BIGINT, store_files BIGINT"
    ).orderBy("step")
