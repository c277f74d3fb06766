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
# policy (r8 VERDICT asks #1 and #6):
# - every window slot holds an ORACLE-BACKED query — rows-only
#   self-certifying queries (they raise in-query on invariant
#   violations and are pytest-verified) live strictly BELOW slot 50,
#   because a `no_oracle` row can never turn green and wastes the one
#   hard external signal;
# - new queries enter at the head for their first driver row;
# - the remaining slots ROTATE through the queries whose last driver
#   green is OLDEST (evidence ages as the driver regenerates testdata
#   between rounds), so over successive rounds every family gets
#   re-witnessed on current data. The r9 window backfills the r1/r2
#   era (text analysis + the SURVEY §2 core); the r10 rotation
#   continues with the remaining r2 set and the r3-r5 families (the
#   ordered queue right after slot 50).
PRIORITY: list[str] = [
    # ROUND-9 WINDOW — 50 oracle-backed slots, zero rows-only rows.
    # Slots 1-4: the r1-era SURVEY §2 core (scan/projection, 5-key
    # dedup-upsert, strict date parse, point lookup) — their only
    # driver greens date to r1/r2-era testdata; fresh greens here
    # renew the §2 operator-table evidence on CURRENT data.
    "q_scan_project",
    "q_dedup_key",
    "q_strict_date_parse",
    "q_point_lookup",
    # Slots 5-14: the 10 queries ADDED this round (queries/round9.py)
    # — substring-level exact dedup over the stride-1 16-token window
    # store (Lee et al. ExactSubstr signal: per-source rates, the
    # strip-or-drop doc worklist, provenance breadth) and the
    # language-axis split (cross-lingual dedup impact, the
    # directional lang matrix, the 40%-capped language token budget),
    # plus the gaps-and-islands span metrics (maximal duplicated-span
    # length histogram, per-source duplicated-substring coverage),
    # the ExactSubstr STRIP step, and dedup-adjusted token budgeting.
    # Pre-flighted exact-match at sf0.001/0.01/0.1 under the
    # integer-key + output-type-gate discipline.
    "q_substring_dedup",
    "q_dup_span_docs",
    "q_substring_provenance",
    "q_dup_span_lengths",
    "q_dup_span_coverage",
    "q_lang_split",
    "q_lang_dup_matrix",
    "q_token_budget_by_lang",
    "q_substring_strip",
    "q_dedup_adjusted_budget",
    # Slots 15-24: the r1 text-analysis family — the OLDEST driver
    # evidence in the registry (round 1) — re-witnessed on current
    # testdata.
    "q_text_stats",
    "q_token_count",
    "q_bpe_token_count",
    "q_lang_id",
    "q_lang_confusion",
    "q_quality_score",
    "q_doc_fingerprint",
    "q_simhash",
    "q_dedup_exact_text",
    "q_tpch_q6",
    # Slots 25-50: twenty-six r2-era queries (sources/casting/normalize
    # pipeline surface, API query twins, window + aggregation
    # breadth) — the §2 S/P/Q/A/O rows' correctness column refreshed
    # on current data.
    "q_source_file_count",
    "q_regex_extract",
    "q_string_predicates",
    "q_filter_nonnull",
    "q_coalesce_date",
    "q_cast_default",
    "q_filter_cast",
    "q_type_classify",
    "q_json_extract",
    "q_range_ts",
    "q_sessionize",
    "q_echo",
    "q_partition_counts",
    "q_sync_log_agg",
    "q_stats_agg",
    "q_merge_upsert",
    "q_flagship_pipeline",
    "q_topk_per_group",
    "q_lag_lead",
    "q_running_balance",
    "q_windowed_dedup",
    "q_union_dedup",
    "q_semi_anti_join",
    "q_set_ops",
    "q_histogram",
    "q_pivot",
    # --- end of the 50-slot driver window ---
    # Slots 51+: the r10 rotation queue, oldest evidence first — the
    # remaining r2 set, then the r3 families. The driver does not
    # read past slot 50; this ordering just makes the next round's
    # backfill a head-truncation instead of a rewrite.
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
    # Rows-only self-certifying queries (in-query invariant raises,
    # pytest-verified) — deliberately BELOW the window: a no_oracle
    # driver row carries no signal.
    "q_kmeans_refine",
    "q_ivf_nprobe_curve",
    "q_lake_vacuum",
    "q_rerank_ann",
    # Strong recent greens (r7/r8 heads), kept next for re-checks
    # once the stale-evidence rotation completes.
    "q_token_budget_sample",
    "q_source_token_budget",
    "q_rerank_candidates",
    "q_kmeans_assign",
    "q_cluster_reps",
    "q_label_propagation",
    "q_epoch_allocation",
    "q_cluster_token_budget",
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
