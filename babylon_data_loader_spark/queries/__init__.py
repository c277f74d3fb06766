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
#   re-witnessed on current data. r9 backfilled the r1/r2 era (text
#   analysis + the SURVEY §2 core, 50/50 green); the r10 window below
#   is the pre-certified queue r9 staged (the remaining r2 set + the
#   r3-r5 families); the r11 queue (r4b/c/d/e, wave3, lake_cdc,
#   round4f — the then-stalest evidence) is staged right behind
#   slot 50 so next round's backfill is again a head-truncation.
PRIORITY: list[str] = [
    # ROUND-10 WINDOW — 50 oracle-backed slots, zero rows-only rows.
    # Slots 1-4: the queries ADDED this round (queries/round10.py) —
    # the production OWNER-KEEP ExactSubstr strip (one owner copy per
    # duplicated span survives), the incremental appended-batch probe
    # against the at-rest window store (plus its streaming twin:
    # stream-static join of in-flight batch windows against the
    # store), and the end-to-end dedup->budget composition over
    # stripped masses. Pre-flighted exact-match at sf0.001/0.01.
    "q_substring_strip_owner",
    "q_incremental_substring",
    "q_stream_incremental_dedup",
    "q_dedup_budget_e2e",
    # Slots 5-7: queries whose CODE changed this round — the r9
    # advice interval-union fix (coverage/budget no longer
    # double-count overlapping token extents) and the kmeans
    # degenerate-input guards — re-witnessed on the shipped code.
    "q_dup_span_coverage",
    "q_dedup_adjusted_budget",
    "q_kmeans_assign",
    # Slots 8-48: the pre-certified r10 rotation queue staged by r9
    # (remaining r2 set, then the r3-r5 families) — the stalest
    # driver evidence in the registry, re-witnessed on current data.
    "q_unpivot",
    "q_rollup",
    "q_cube",
    "q_grouping_sets",
    "q_asof_join",
    "q_asof_tolerance",
    "q_attribution_join",
    "q_distinct_agg",
    "q_having",
    "q_interval_join",
    "q_jaccard_pairs",
    "q_knn_batch",
    "q_near_dup_rate",
    "q_range_band_join",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_window_breadth",
    "q_bucketed_join",
    "q_chunk_documents",
    "q_contamination",
    "q_domain_mix",
    "q_embedding_quantize",
    "q_lake_point_lookup",
    "q_layout_skipping",
    "q_media_audio_features",
    "q_media_dedup",
    "q_media_video_features",
    "q_median",
    "q_part_supplier_diversity",
    "q_pii_scrub",
    "q_repetition_filter",
    "q_robust_zscore",
    "q_scalar_subquery",
    "q_schema_evolution",
    "q_ship_delay",
    "q_stratified_sample",
    "q_stream_replay",
    "q_stream_session",
    "q_stream_window",
    "q_udtf_ngrams",
    "q_unigram_nll",
    # Slots 49-50: kmeans-lane dependent (q_cluster_token_budget
    # inherits this round's operator change) + an r6 token-budget
    # head whose last green predates r7.
    "q_cluster_token_budget",
    "q_token_budget_sample",
    # --- end of the 50-slot driver window ---
    # Slots 51-101: the r11 rotation queue, oldest evidence first —
    # the other r6 token-budget head, then the r4b/c/d/e waves,
    # wave3, the lake CDC family, and the head of the round4f
    # text-statistics family. The driver does not read past slot 50;
    # this ordering just makes the next round's backfill a
    # head-truncation instead of a rewrite.
    "q_source_token_budget",
    "q_column_profile",
    "q_word_entropy",
    "q_radius_search",
    "q_benford_digits",
    "q_containment_pairs",
    "q_length_band",
    "q_salted_agg",
    "q_incremental_dedup",
    "q_file_provenance",
    "q_pmi_collocations",
    "q_source_drift",
    "q_export_shards",
    "q_event_funnel",
    "q_retention_cohorts",
    "q_copurchase_pagerank",
    "q_gap_fill",
    "q_sliding_window",
    "q_anomaly_hours",
    "q_fuzzy_join",
    "q_scd2_dimension",
    "q_triangle_count",
    "q_data_quality",
    "q_oov_rate",
    "q_equal_freq_binning",
    "q_spearman_corr",
    "q_weighted_sample",
    "q_boolean_search",
    "q_bfs_hops",
    "q_twap",
    "q_key_skew",
    "q_unicode_normalize",
    "q_ewma",
    "q_linreg_by_group",
    "q_variance_moments",
    "q_correlation_moments",
    "q_array_ops",
    "q_string_funcs",
    "q_date_funcs",
    "q_hash_split",
    "q_incremental_agg",
    "q_time_travel",
    "q_write_expectations",
    "q_mv_rewrite",
    "q_rank_sum_test",
    "q_ks_statistic",
    "q_welch_ttest",
    "q_acf",
    "q_feature_mi",
    "q_gini",
    "q_sequence_pattern",
    # Rows-only self-certifying queries (in-query invariant raises,
    # pytest-verified) — deliberately BELOW the window: a no_oracle
    # driver row carries no signal.
    "q_kmeans_refine",
    "q_ivf_nprobe_curve",
    "q_lake_vacuum",
    "q_rerank_ann",
    "q_tokwin_maintenance",
    # Strong recent greens (r7-r9 heads), kept next for re-checks
    # once the stale-evidence rotation completes.
    "q_rerank_candidates",
    "q_cluster_reps",
    "q_label_propagation",
    "q_epoch_allocation",
    "q_cross_lingual_dup",
    "q_source_dedup_matrix",
    "q_winsorize",
    "q_mmr_diversify",
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
