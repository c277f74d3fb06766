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
#   and r11 ran their staged queues (50/50 green each); r12 converted
#   the kNN lanes to oracles; r13 cleared the entire pre-r7 backlog;
#   the r14 window below covers the r7/r8 cohort (43 of its 50
#   lanes) plus this round's 1 new + 5 code-touched lanes and the
#   one-time q_tokwin_maintenance driver row, leaving a 7-lane
#   staged r15 queue right behind slot 50.
PRIORITY: list[str] = [
    # ROUND-14 WINDOW — 50 slots drawn from {this round's new +
    # code-touched lanes} ∪ {the r7/r8 driver-evidence backlog}
    # (r13 VERDICT ask #1). Slots 1-7, head policy (fresh driver rows
    # land on the code that ships):
    #  - q_incremental_admission (NEW, queries/round14.py): two
    #    admission waves with append_token_windows + gram-index
    #    append between — at-rest structures MAINTAINED, not rebuilt
    #    (r13 ask #5);
    #  - q_admission_gate: code-touched (grouped_running_totals'
    #    ranged frame + offsets now live in the index store, ask #3);
    #  - q_merge_divergent_stress: code-touched (name-sorted,
    #    orderable-only trailing tiebreak — r13 ADVICE);
    #  - q_ivf_nprobe_curve / q_kmeans_refine / q_knn_ivf:
    #    code-touched (the IVF/k-means family moved onto the at-rest
    #    assigned-vector and Lloyd-model stores, ask #2);
    #  - q_tokwin_maintenance: rows-only, deliberately windowed ONCE
    #    — the only declared key with zero driver entries across
    #    r1-r13 (ask from the r13 VERDICT "What's missing" #2); it
    #    returns to below-window after this round.
    "q_incremental_admission",
    "q_admission_gate",
    "q_merge_divergent_stress",
    "q_ivf_nprobe_curve",
    "q_kmeans_refine",
    "q_knn_ivf",
    "q_tokwin_maintenance",
    # Slots 8-18: the 11 r7-green lanes (the stalest oracle-backed
    # driver evidence in the registry).
    "q_class_rebalance",
    "q_decay_weighted",
    "q_embedding_dup_pairs",
    "q_media_image_features",
    "q_ndcg_eval",
    "q_quantile_normalize",
    "q_semantic_dedup",
    "q_skipgram_pairs",
    "q_stream_sliding",
    "q_target_encode",
    "q_wilson_quality",
    # Slots 19-50: 32 of the 39 r8-green lanes, oldest-evidence
    # cohort, alphabetical. The 7 that do not fit (staged first for
    # r15 below) are exactly the r8 lanes the r13 judge re-verified
    # exact this session (J13 sample), so they carry the freshest
    # independent evidence of the cohort.
    "q_bigram_nll",
    "q_boilerplate_ngrams",
    "q_burstiness",
    "q_chi2_terms",
    "q_chunk_dedup_rate",
    "q_cluster_reps",
    "q_cluster_size_histogram",
    "q_cross_lingual_dup",
    "q_dedup_clusters",
    "q_dedup_savings",
    "q_dedup_threshold_sweep",
    "q_dup_weight",
    "q_embedding_outliers",
    "q_epoch_allocation",
    "q_heldout_coverage",
    "q_label_cohesion",
    "q_label_propagation",
    "q_length_histogram",
    "q_mmr_diversify",
    "q_ngram_diversity",
    "q_ngram_novelty",
    "q_normalization_impact",
    "q_pair_label_confusion",
    "q_pareto_frontier",
    "q_prefix_dedup",
    "q_quality_calibration",
    "q_rerank_candidates",
    "q_source_overlap",
    "q_split_leakage",
    "q_tokenizer_fertility",
    "q_winsorize",
    "q_zipf_slope",
    # --- end of the 50-slot driver window ---
    # Slots 51-57: the staged r15 queue — the 7 r8-era lanes this
    # window could not hold (J13-re-verified, so the least urgent of
    # the cohort). After r14 lands, the max driver-evidence age of
    # any oracle-backed lane is r8 for exactly these seven; r15's
    # backfill is again a head-truncation.
    "q_tpch_q12",
    "q_tpch_q16",
    "q_lake_zorder",
    "q_rrf_fusion",
    "q_vocab_coverage",
    "q_source_dedup_matrix",
    "q_curriculum_order",
    # Slots 58-105: the 48-lane r9-green cohort (next-stalest after
    # the seven above), alphabetical — staged so the r15 window
    # (7 r8 + 43 of these, head slots going to r15's code-touched
    # lanes) is again a pure head-truncation. Evidence census
    # reproducible from CORRECTNESS_r01..r14.
    "q_bpe_token_count",
    "q_cast_default",
    "q_coalesce_date",
    "q_dedup_exact_text",
    "q_dedup_key",
    "q_doc_fingerprint",
    "q_dup_span_docs",
    "q_dup_span_lengths",
    "q_echo",
    "q_filter_cast",
    "q_filter_nonnull",
    "q_flagship_pipeline",
    "q_histogram",
    "q_json_extract",
    "q_lag_lead",
    "q_lang_confusion",
    "q_lang_dup_matrix",
    "q_lang_id",
    "q_lang_split",
    "q_merge_upsert",
    "q_partition_counts",
    "q_pivot",
    "q_point_lookup",
    "q_quality_score",
    "q_range_ts",
    "q_regex_extract",
    "q_running_balance",
    "q_scan_project",
    "q_semi_anti_join",
    "q_sessionize",
    "q_set_ops",
    "q_simhash",
    "q_source_file_count",
    "q_stats_agg",
    "q_strict_date_parse",
    "q_string_predicates",
    "q_substring_dedup",
    "q_substring_provenance",
    "q_substring_strip",
    "q_sync_log_agg",
    "q_text_stats",
    "q_token_budget_by_lang",
    "q_token_count",
    "q_topk_per_group",
    "q_tpch_q6",
    "q_type_classify",
    "q_union_dedup",
    "q_windowed_dedup",
    # Rows-only self-certifying queries (in-query invariant raises,
    # pytest-verified) — deliberately BELOW the window: a no_oracle
    # driver row carries no signal. Whole-registry rows-only census:
    # 7 (q_knn_recall_guard, q_ann_index_maintenance, the two native
    # sketches, q_compression_ratio, q_lake_vacuum,
    # q_tokwin_maintenance — the last windowed once in r14 above).
    "q_lake_vacuum",
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
        round13,
        round14,
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
