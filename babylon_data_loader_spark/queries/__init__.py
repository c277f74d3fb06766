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
#   analysis + the SURVEY §2 core, 50/50 green); r10 ran the queue r9
#   staged (50/50 green); the r11 window below head-truncates the
#   queue r10 staged, with this round's 4 new queries and 3
#   rows-only->oracle conversions at the head; the r12 queue (the 8
#   displaced tail entries, then the r3 TPC-H / r4 roundtrip / r5
#   statistics evidence) is staged right behind slot 50 so next
#   round's backfill is again a head-truncation.
PRIORITY: list[str] = [
    # ROUND-11 WINDOW — 50 oracle-backed slots, zero rows-only rows.
    # Slots 1-4: the queries ADDED this round (queries/round11.py) —
    # the incremental owner-keep ExactSubstr strip (batch losers only;
    # the corpus owns spans it already contains), the concurrent
    # two-writer MERGE stress over the tx_lake O_EXCL claim path,
    # benchmark decontamination as a per-doc actionable report
    # (census + rate per contaminated doc — the worklist twin of
    # curation.py::q_contamination's source-level audit), and its
    # admission-path composition (batch grams probed against the
    # AT-REST eval-gram index; corpus never rescanned).
    "q_incremental_strip_owner",
    "q_merge_concurrent_stress",
    "q_decontaminate",
    "q_incremental_decontaminate",
    # Slots 5-7: rows-only -> ORACLE-BACKED conversions (r10 VERDICT
    # ask #3, operators/det_ann.py): their retrieval/assignment
    # stages were re-derived from md5-seeded integer arithmetic both
    # engines evaluate identically, so their first-ever hash-checked
    # driver rows land on the code that ships.
    "q_rerank_ann",
    "q_ivf_nprobe_curve",
    "q_kmeans_refine",
    # Slots 8-50: the first 43 of the pre-certified r11 rotation
    # queue r10 staged (oldest driver evidence first: the r6
    # token-budget head, the r4b/c/d/e waves, wave3, lake_cdc, the
    # round4f head) — re-witnessed on current data. The queue held
    # 51 names for 50 slots even before this round's 7 head entries;
    # the 8 displaced tail entries lead the r12 queue below.
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
    # --- end of the 50-slot driver window ---
    # Slots 51-102: the staged r12 rotation queue — first the 8
    # entries the r11 head displaced from r10's staging, then the
    # stalest remaining driver evidence (last green r3: the TPC-H
    # family re-witnessed in r3's window; then the r4 roundtrip/
    # stream/media wave; then the r5 statistics heads). The driver
    # does not read past slot 50; this ordering makes the next
    # round's backfill a head-truncation again.
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
    # Rows-only self-certifying queries (in-query invariant raises,
    # pytest-verified) — deliberately BELOW the window: a no_oracle
    # driver row carries no signal. r11 converted q_kmeans_refine,
    # q_ivf_nprobe_curve and q_rerank_ann to full oracles (see the
    # window head); these two remain genuinely non-SQL-reproducible
    # (file-retention layout / store-lifecycle checksums).
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
