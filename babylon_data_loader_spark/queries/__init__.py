"""Declared-query registry: every operator from SURVEY.md §2 that the
driver verifies against a DuckDB oracle at sf0.01.

Each query is a `(spark, sf_dir) -> DataFrame` callable registered with
an equivalent ANSI-SQL oracle string (or None for genuinely
non-SQL-expressible operators, which get a weaker rows-only check).

Exact-match discipline (SURVEY.md §7 hard-part 4):
- every computed column aliased identically in Spark and SQL
- cross-row float sums go through DECIMAL (exact) then cast to DOUBLE
- event timestamps compared in integer MICROseconds
  (`schemas.event_ts_us` vs DuckDB `epoch_us`): the helper absorbs
  both testdata encodings of `ts` (BIGINT nanos / TIMESTAMP_NTZ
  micros) into the same epoch-micros BIGINT
- deterministic tiebreaks on every window/top-k
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a declared query and (optionally) its DuckDB oracle.

    Each invocation first releases the PREVIOUS query's tracked
    persists (functions/cache.py): operators persist narrow frames
    that feed self-joins, and those caches must outlive their function
    but not the whole session — in a sequential 218-query harness run
    this bounds live cached partitions to one query's working set.
    """

    def deco(fn):
        def wrapped(spark, sf_dir):
            from babylon_data_loader_spark.functions.cache import (
                release_tracked,
            )

            release_tracked()
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


# Verification priority: the driver's correctness harness verifies
# exactly the FIRST 50 entries of this registry each round. Window
# policy (r8 VERDICT asks #1 and #6, executed as staged rotations
# since):
# - every window slot holds an ORACLE-BACKED query — rows-only
#   self-certifying queries (they raise in-query on invariant
#   violations and are pytest-verified) live strictly BELOW slot 50,
#   because a `no_oracle` row can never turn green and wastes the one
#   hard external signal;
# - new AND code-changed queries enter at the head for a fresh
#   driver row on the code that will actually ship;
# - the remaining slots ROTATE through the queries whose last driver
#   green is OLDEST (evidence ages as the driver regenerates testdata
#   between rounds), so over successive rounds every family gets
#   re-witnessed on current data. r9 backfilled the r1/r2 era; r10
#   and r11 ran their staged queues (50/50 green each); the r12
#   window below head-truncates the queue r11 staged, with this
#   round's 3 new queries, 4 rows-only->oracle conversions and 4
#   code-touched lanes at the head; the r13 queue (the 13 displaced
#   tail entries, then the stalest r5-r7 evidence) is staged right
#   behind slot 50 so next round's backfill is again a
#   head-truncation.
PRIORITY: list[str] = [
    # ROUND-12 WINDOW — 50 oracle-backed slots, zero rows-only rows.
    # Slots 1-11: this round's new and code-touched queries, per the
    # head policy (fresh driver rows land on the code that ships):
    #  - q_kmv_distinct (NEW, queries/wave3.py): the oracle-CHECKABLE
    #    distinct sketch (KMV/bottom-k over md5-derived 60-bit
    #    hashes) — the cross-engine-exact complement to
    #    q_sketch_distinct's native HLL++, which stays rows-only;
    #  - q_admission_gate (NEW, queries/round12.py): the composed
    #    decontaminate -> owner-keep strip -> token-budget admission
    #    pipeline (r11 VERDICT ask #6);
    #  - q_merge_divergent_stress (NEW, round12.py): concurrent MERGE
    #    with DIVERGENT overlap values under resolve-by-total-order
    #    (r11 VERDICT ask #4);
    #  - q_knn_lsh / q_knn_ivf / q_knn_pq / q_knn_ivfpq: rows-only ->
    #    ORACLE-BACKED conversions via operators/det_ann.py (r11
    #    VERDICT ask #2) — integer sign-LSH over the shared
    #    bucket-partitioned signature store, Lloyd-trained integer
    #    IVF, sampled-seed PQ/ADC, and IVF-PQ with residual codes;
    #  - q_rerank_ann: code-touched (its signature store is now the
    #    shared BUCKET-PARTITIONED det store, probes partition-pruned);
    #  - q_decontaminate / q_incremental_decontaminate: code-touched
    #    (gram tokenization normalized to tokens(lower(text)), r11
    #    ADVICE; oracle CTE + store key updated in lockstep);
    #  - q_lake_delete: code-touched (fast-path eligibility is now a
    #    reference-set pre-check, not probe-and-catch — r11 ask #5).
    "q_kmv_distinct",
    "q_admission_gate",
    "q_merge_divergent_stress",
    "q_knn_lsh",
    "q_knn_ivf",
    "q_knn_pq",
    "q_knn_ivfpq",
    "q_rerank_ann",
    "q_decontaminate",
    "q_incremental_decontaminate",
    "q_lake_delete",
    # Slots 12-50: the first 39 of the r12 rotation queue staged by
    # r11 (stalest driver evidence first: the 8 entries the r11 head
    # displaced, the r3 TPC-H family, the r4 roundtrip/stream/media
    # wave, the r5 statistics heads) — re-witnessed on current data.
    # The 11-slot head is forced by the head policy (7 new-oracle +
    # 4 code-touched), so 39 of the 52 staged entries fit; the
    # remaining 13 lead the r13 queue below. Pre-r7 backlog after
    # this window lands: 78 - 39 = 39 (r13 finishes most of it).
    "q_mv_rewrite",
    "q_rank_sum_test",
    "q_ks_statistic",
    "q_welch_ttest",
    "q_acf",
    "q_feature_mi",
    "q_gini",
    "q_sequence_pattern",
    "q_tpch_q10",
    "q_tpch_q13",
    "q_tpch_q14",
    "q_tpch_q15",
    "q_tpch_q17",
    "q_tpch_q18",
    "q_tpch_q19",
    "q_tpch_q21",
    "q_tpch_q22",
    "q_tpch_q4",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_approx_join_sketch",
    "q_bigram_freq",
    "q_dedup_survivorship",
    "q_embedding_dup_pairs_exact",
    "q_embedding_stats",
    "q_feature_hash",
    "q_hard_negatives",
    "q_jsonl_roundtrip",
    "q_label_encode",
    "q_media_resize",
    "q_mode_per_group",
    "q_orc_roundtrip",
    "q_stream_dedup",
    "q_stream_enrich",
    "q_stream_join",
    "q_tpch_q11",
    "q_tpch_q2",
    "q_tpch_q9",
    "q_abc_classification",
    # --- end of the 50-slot driver window ---
    # Slots 51-103: the staged r13 rotation queue — first the 13
    # entries this round's head displaced from r11's staging, then
    # the stalest remaining driver evidence (last green r5/r6/r7),
    # oldest first. The driver does not read past slot 50; this
    # ordering keeps next round's backfill a head-truncation.
    "q_association_rules",
    "q_bm25_topk",
    "q_corpus_report",
    "q_covariance_matrix",
    "q_cumulative_uniques",
    "q_degree_distribution",
    "q_distinctive_terms",
    "q_fuzzy_clusters",
    "q_js_divergence",
    "q_markov_transitions",
    "q_media_resample",
    "q_median_by_group",
    "q_minhash_calibration",
    "q_phrase_search",
    "q_qq_points",
    "q_readability",
    "q_rfm_segments",
    "q_rolling_median",
    "q_seasonality_profile",
    "q_stream_complete",
    "q_stream_left_join",
    "q_tpch_q20",
    "q_vocab_growth",
    "q_changepoint",
    "q_cross_source_leakage",
    "q_delta_export",
    "q_dup_burden_by_source",
    "q_entropy_rate",
    "q_forecast_eval",
    "q_heavy_hitters",
    "q_interarrival_dist",
    "q_kaplan_meier",
    "q_knn_cosine",
    "q_lake_skipping",
    "q_lorenz_points",
    "q_pack_sequences",
    "q_stream_stateful",
    "q_tfidf_top_terms",
    "q_tpch_q1",
    "q_class_rebalance",
    "q_corpus_curation",
    "q_decay_weighted",
    "q_embedding_dup_pairs",
    "q_media_image_features",
    "q_minhash_bands",
    "q_ndcg_eval",
    "q_near_dup_pairs",
    "q_quantile_normalize",
    "q_semantic_dedup",
    "q_skipgram_pairs",
    "q_stream_sliding",
    "q_target_encode",
    "q_wilson_quality",
    # Rows-only self-certifying queries (in-query invariant raises,
    # pytest-verified) — deliberately BELOW the window: a no_oracle
    # driver row carries no signal. r12 converted the four kNN lanes
    # to full oracles (see the window head); the whole-registry
    # rows-only census is now 7 (q_knn_recall_guard — where the FLOAT
    # ANN production paths keep declared coverage —
    # q_ann_index_maintenance, the two sketches, q_compression_ratio,
    # and these two genuinely non-SQL-reproducible lanes).
    "q_lake_vacuum",
    "q_tokwin_maintenance",
]


def load_all() -> None:
    """Import every query module (they self-register)."""
    from babylon_data_loader_spark.queries import (  # noqa: F401
        analytics,
        core,
        curation,
        curation2,
        extra,
        intervals,
        json_source,
        lake_cdc,
        media,
        round4,
        round4b,
        round4c,
        round4d,
        round4e,
        round4f,
        round6,
        round6b,
        round6c,
        round7,
        round7b,
        round7c,
        round8,
        round8b,
        round9,
        round10,
        round11,
        round12,
        streaming_dedup,
        streaming_replay,
        streaming_window,
        text,
        tpch_more,
        tpch_sub,
        vectors,
        wave3,
    )

    # Stable reorder: PRIORITY names first (in PRIORITY order), then the
    # rest in registration order.
    for reg in (QUERIES, ORACLES):
        ordered = {n: reg[n] for n in PRIORITY if n in reg}
        ordered.update((n, f) for n, f in reg.items() if n not in ordered)
        reg.clear()
        reg.update(ordered)
