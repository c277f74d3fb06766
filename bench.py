"""Headline benchmark: runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully executed (count + collect of the usually-small
result) — not just planned. A warmup pass of one trivial job absorbs
JVM/codegen startup so numbers reflect steady-state execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from babylon_data_loader_spark.session import build_session  # noqa: E402

# The headline set: scan+agg, join+topk, star join, window dedup,
# sessionization, as-of join, text dedup family, similarity search.
HEADLINE = [
    "q_tpch_q1",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q6",
    "q_tpch_q10",
    "q_tpch_q18",
    "q_dedup_key",
    "q_sessionize",
    "q_asof_join",
    "q_dedup_exact_text",
    "q_minhash_bands",
    "q_simhash",
    "q_knn_cosine",
    "q_text_stats",
    "q_flagship_pipeline",
    # round 2 additions: banded embedding LSH (the declared scale
    # path), correlated-subquery decorrelation, real media decode,
    # and the composed corpus-curation pipeline.
    "q_tpch_q17",
    "q_media_image_features",
    "q_corpus_curation",
    # round 3 additions: at-rest LSH index probe (rep 1 pays the
    # index write, rep 2 is the amortized partition-pruned probe),
    # the frame-sampled video lane, PQ-code ANN, exact heavy hitters
    # via Misra-Gries pruning, and the full semantic-dedup
    # composition (LSH pairs -> components -> representatives).
    "q_media_video_features",
    "q_heavy_hitters",
    "q_semantic_dedup",
    # round 4 additions: Bloom semi-join reduction and survivorship
    # merge (max-struct agg, one shuffle row per group).
    "q_approx_join_sketch",
    "q_dedup_survivorship",
    # round 4 wave 2: word-entropy quality signal, explicit salted
    # aggregation, and asymmetric containment dedup (shared shingle
    # frame + document-frequency candidate cap).
    "q_word_entropy",
    "q_salted_agg",
    "q_containment_pairs",
    # round 4 wave 5: the correlated-min and profit TPC-H shapes, the
    # one-shuffle SCD2 window build, and hash-deterministic weighted
    # sampling (per-row decision, agg-only shuffle).
    "q_tpch_q2",
    "q_tpch_q9",
    "q_scd2_dimension",
    "q_weighted_sample",
    # round 5 additions: the distributed two-pass ranking operator
    # (operators/rank.py) exercised end-to-end — triple NTILE over the
    # per-customer frame and the rank-weighted Gini aggregate.
    "q_rfm_segments",
    "q_gini",
    # round 6 additions: two-stage retrieve->re-rank and token-budget
    # corpus sampling via the distributed prefix scan.
    "q_rerank_candidates",
    # round 6 wave 2: the feature-engineering family's two heavy
    # shapes — the grouped distributed prefix scan (per-source rank
    # normalization) and the token-explode + marginal-join +
    # rank-limit-pruned chi-squared term selection.
    "q_quantile_normalize",
    "q_chi2_terms",
    # round 6 wave 3: the split-hygiene composition — verified
    # near-dup pairs -> connected components -> per-cluster weight
    # join, the deepest reuse of the shared at-rest shingle store.
    "q_dup_weight",
    # round 7 additions: the wave's two heavy shapes — the bigram-LM
    # NLL (position self-join + two count-model joins back onto the
    # bigram stream) and pairwise source-content overlap (grouped
    # distinct over the at-rest shingle store + shingle-keyed pair
    # intersection).
    "q_bigram_nll",
    "q_source_overlap",
    # round 8 additions: the clustering lane's two heavy shapes —
    # broadcast-codebook nearest-centroid assignment (argmin window
    # over the crossJoin, no vector shuffle) and majority-label
    # propagation over the at-rest verified-pair graph (two
    # count+argmax rounds of bare (id, label) shuffles).
    "q_label_propagation",
    # the capstone composition: kmeans assignment x grouped prefix
    # scan — per-semantic-cluster token-budget sampling.
    "q_cluster_token_budget",
    # round 9 additions: the substring-dedup lane's heavy shape (the
    # stride-1 16-token window store: corpus-token-scale build on
    # rep 1, hash-keyed aggregates after) and the language split over
    # the at-rest verified-pair store.
    "q_substring_dedup",
    "q_lang_split",
    # the strip lane: per-doc indexed-lambda span removal over the
    # island frame — the round's third distinct new shape.
    # round 10 additions: the production owner-keep strip (adds the
    # hash-keyed min(struct) ownership aggregate to the strip shape)
    # and the incremental batch probe against the at-rest window
    # store (in-flight hashing semi-joined onto stored hashes).
    "q_substring_strip_owner",
    # round 11 additions: the incremental admission-path strip
    # (corpus-distinct-hash semi/anti joins + batch-internal
    # ownership over in-flight windows) and the three det_ann-backed
    # lanes — deterministic sign-LSH retrieve->rerank through the
    # at-rest signature store, the integer IVF nprobe curve, and
    # integer-grid Lloyd (broadcast-codebook assignment shape).
    # q_merge_concurrent_stress is deliberately NOT a bench lane: its
    # value is claim-contention correctness, and its wall time is
    # dominated by 7 sequential commit fsyncs, not data-plane work.
    "q_incremental_strip_owner",
    "q_rerank_ann",
    "q_ivf_nprobe_curve",
    "q_kmeans_refine",
    # Eval-set n-gram decontamination: corpus gram explode + one
    # broadcast hash join — the curation hygiene pass a training
    # pipeline runs over every admitted batch — and its admission-path
    # variant (batch-only gram hashing probed against the at-rest
    # eval-gram index; store_hit attributes the one-time build).
    "q_decontaminate",
    # round 12 additions: the composed admission gate (decontaminate
    # -> owner-keep strip -> per-source token-budget admit, three
    # at-rest-store probes in one plan) and IVF-PQ over the integer
    # grid (coarse-pruned cid-partitioned code scan + per-list ADC +
    # rerank — the composed at-rest ANN layout).
    # q_merge_divergent_stress is NOT a lane for the same
    # reason as q_merge_concurrent_stress — commit-fsync-bound.
    # r13: the per-family subsumed lanes moved to sweep-only — see
    # FAMILY_MAP below (r12 VERDICT ask #6).
    "q_admission_gate",
    "q_knn_ivfpq",
]

# Headline cap (r12 VERDICT ask #6): the suite had grown to 59 lanes
# (~55 s quiet) with several lanes re-measuring the same operators.
# Each family below keeps its MAXIMAL lane (the superset composition)
# in HEADLINE; the subsumed lanes are sweep-only — still
# oracle-verified every certification sweep, just not re-timed every
# round. This map is emitted in the bench JSON so round-over-round
# comparisons know exactly what was demoted and why.
FAMILY_MAP = {
    "det_ann_probe": {
        "headline": ["q_rerank_ann", "q_knn_ivfpq", "q_ivf_nprobe_curve"],
        "sweep_only": ["q_knn_lsh", "q_knn_pq", "q_knn_ivf"],
        "why": "q_rerank_ann probes the same bucket-partitioned "
               "detsig store as q_knn_lsh plus the rerank stage; "
               "q_knn_ivfpq composes q_knn_pq's ADC with IVF "
               "coarse pruning",
    },
    "substring_strip": {
        "headline": ["q_substring_strip_owner", "q_incremental_strip_owner"],
        "sweep_only": ["q_substring_strip", "q_incremental_substring"],
        "why": "the owner-keep lanes are supersets (same island "
               "strip + the ownership aggregate)",
    },
    "decontaminate": {
        "headline": ["q_decontaminate", "q_admission_gate"],
        "sweep_only": ["q_incremental_decontaminate"],
        "why": "the admission gate's stage 1 IS the incremental "
               "probe against the same eval-gram store",
    },
    "kmeans": {
        "headline": ["q_kmeans_refine"],
        "sweep_only": ["q_kmeans_assign"],
        "why": "refine iterates the assign shape",
    },
    "embedding_dedup": {
        "headline": ["q_semantic_dedup"],
        "sweep_only": ["q_embedding_dup_pairs"],
        "why": "semantic dedup = pair store + connected components",
    },
    "minhash_dedup": {
        "headline": ["q_dup_weight", "q_corpus_curation", "q_minhash_bands"],
        "sweep_only": ["q_near_dup_pairs"],
        "why": "q_dup_weight reads the same verified-pair store "
               "plus components + weight join",
    },
    "token_budget": {
        "headline": ["q_cluster_token_budget"],
        "sweep_only": ["q_token_budget_sample"],
        "why": "the cluster lane runs the same grouped prefix scan "
               "per semantic cluster",
    },
}


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def _regression_report(
    timings: dict[str, float],
    prev: dict,
    probe_now: float,
    store_hit: dict[str, bool] | None = None,
) -> tuple[dict, dict | None]:
    """Calibration-normalized round-over-round regression gate.

    The raw 1.5x per-query threshold cried wolf whenever the driver
    box was contended (the r8 run named 10 "regressions" on a doc-only
    commit while its own spark_probe ran +33%), so the threshold is
    scaled by the machine-calibration drift: probe_now / probe_prev,
    floored at 1.0 (a FASTER box must not hide real slowdowns). When
    the probe moved more than 15% a calibration_drift note is
    returned alongside, so a contended run is self-evident in the
    JSON. Queries whose first rep paid an at-rest store build are
    annotated cold_store — a one-time layout cost, not a plan
    regression. Pure function of its inputs so the gate is unit-
    testable against injected load (r8 VERDICT ask #3)."""
    prev_q = prev.get("queries", {})
    prev_probe = (prev.get("calibration") or {}).get(
        "spark_probe_s"
    ) or 0.0
    drift = probe_now / prev_probe if prev_probe > 0 else 1.0
    threshold = 1.5 * max(1.0, drift)
    regs = {}
    for q, t in timings.items():
        if q in prev_q and prev_q[q] > 0.2 and t > prev_q[q] * threshold:
            entry = {"prev": prev_q[q], "now": t}
            if store_hit is not None and store_hit.get(q) is False:
                entry["cold_store"] = True
            regs[q] = entry
    note = None
    if abs(drift - 1.0) > 0.15:
        note = {
            "prev_spark_probe_s": prev_probe,
            "now_spark_probe_s": probe_now,
            "ratio": round(drift, 3),
            "note": (
                "machine calibration moved >15% between runs; the "
                "regression threshold was scaled accordingly"
                if drift > 1.0
                else "machine calibration moved >15% between runs "
                "(faster box); threshold NOT relaxed"
            ),
        }
    return regs, note


def _testdata_fingerprint(sf_dir: str) -> dict:
    """Per-table size+mtime plus one digest — BENCH_HISTORY carries it
    so a cross-round drift can be attributed to data regeneration (new
    fingerprint) vs code (same fingerprint) in one line."""
    import hashlib

    tables = {}
    h = hashlib.md5()
    for t in _TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        try:
            st = os.stat(p)
            tables[t] = {"bytes": st.st_size, "mtime_ns": st.st_mtime_ns}
            h.update(f"{t}:{st.st_size}:{st.st_mtime_ns}\n".encode())
        except OSError:
            tables[t] = None
    return {"digest": h.hexdigest()[:12], "tables": tables}


def _git_commit() -> str:
    import subprocess

    try:
        return (
            subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True,
                text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
                timeout=10,
            ).stdout.strip()
            or "unknown"
        )
    except Exception:
        return "unknown"


# Isolated-rerun set (r7 VERDICT ask #3): the queries that drifted
# +17-40% at equal calibration between the r6 and r7 clean runs with
# UNCHANGED plan digests. Each runs in a FRESH process (fresh JVM,
# fresh session, nothing else run before it) so suite-position /
# JVM-state effects are separated from real per-query cost: if the
# isolated medians match the r6 numbers, the drift was suite-state;
# if they match the r7 in-suite numbers, it localizes a regression.
ISOLATED_SET = [
    "q_tpch_q1",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q10",
    "q_tpch_q18",
    "q_rfm_segments",
    "q_rerank_candidates",
    # the other two lanes the r10 driver run flagged (r10 VERDICT
    # ask #2) — kept in the standing isolated set so every future
    # round carries fresh-process evidence for them
    "q_substring_dedup",
    "q_substring_strip",
    # the three r11-optimized det_ann lanes (job-count / literal-
    # assembly rework): standing fresh-process numbers so any future
    # drift question starts from evidence, not a bespoke rerun
    "q_kmeans_refine",
    "q_ivf_nprobe_curve",
    "q_rerank_ann",
    # r14: the IVF-PQ lane joined the at-rest-store family audit —
    # its isolated block now witnesses store_hit for the code store
    "q_knn_ivfpq",
    # r12: the new top-cost lane (composed 3-stage admission gate —
    # its in-suite number includes the prefix-scan offsets pass) and
    # the lane whose cost deliberately moved (gram normalization)
    "q_admission_gate",
    "q_decontaminate",
]


def _isolated_one(name: str, sf_dir: str, reps: int) -> None:
    """Subprocess entry: time ONE query in a fresh session and print
    one JSON line. Session startup and the warmup job are excluded
    from the timing — the isolation experiment varies only what ran
    BEFORE the query, not what the query itself costs.

    Each sample is split into BUILD (the queries() callable: plan
    construction, py4j literal assembly, and any first-touch at-rest
    store build — the costs a fresh process pays that an in-suite rep
    does not) and EXEC (the .count() action), with the store
    hit/build attribution per sample — so an isolated median that
    exceeds its in-suite time self-explains instead of reading as an
    unexplained slowdown (r12 VERDICT ask #4: q_admission_gate's
    13.6 s isolated headline was store-first-touch + fresh-JVM cost,
    explained only in PERF_NOTES prose)."""
    from babylon_data_loader_spark.operators.index_store import (
        ACCESS_LOG,
    )

    spark = build_session(app_name=f"bench-isolated-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = entrymod.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    samples, builds, execs, hits = [], [], [], []
    for _ in range(max(1, reps)):
        ACCESS_LOG.clear()
        t0 = time.time()
        df = qmap[name](spark, sf_dir)
        t1 = time.time()
        df.count()
        t2 = time.time()
        builds.append(t1 - t0)
        execs.append(t2 - t1)
        samples.append(t2 - t0)
        hits.append(
            all(a["hit"] for a in ACCESS_LOG) if ACCESS_LOG else None
        )
    print(
        json.dumps(
            {
                "q": name,
                "sec": round(_median(samples), 3),
                "samples": [round(s, 3) for s in samples],
                "build_s": [round(s, 3) for s in builds],
                "exec_s": [round(s, 3) for s in execs],
                "store_hit": hits,
            }
        )
    )
    spark.stop()


def _isolated_supplement(
    sf_dir: str, reps: int, in_suite: dict[str, float]
) -> dict:
    import subprocess

    here = os.path.abspath(__file__)
    timings: dict[str, dict] = {}
    for name in ISOLATED_SET:
        proc = subprocess.run(
            [sys.executable, here, "--isolated-one", name, sf_dir,
             str(reps)],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(here),
            timeout=900,
        )
        out_lines = (proc.stdout or "").strip().splitlines()
        line = out_lines[-1] if out_lines else ""
        try:
            rec = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            timings[name] = {"error": (proc.stderr or "no output")[-200:]}
            continue
        entry = {"isolated_sec": rec["sec"], "samples": rec["samples"]}
        for k in ("build_s", "exec_s", "store_hit"):
            if k in rec:
                entry[k] = rec[k]
        if name in in_suite:
            entry["in_suite_sec"] = in_suite[name]
            entry["ratio_in_suite_over_isolated"] = round(
                in_suite[name] / rec["sec"], 2
            ) if rec["sec"] > 0 else None
        timings[name] = entry
    return {
        "note": (
            "each query re-timed in a FRESH process (fresh JVM + "
            "session, warmup excluded) to separate suite-state drift "
            "from real per-query cost (r7 VERDICT ask #3)"
        ),
        "queries": timings,
    }


# Scan-bound subset for the optimized-layout supplement.
OPTIMIZED_SUBSET = [
    "q_tpch_q1",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q6",
    "q_tpch_q10",
    "q_tpch_q18",
    "q_tpch_q17",
    "q_dedup_key",
    "q_flagship_pipeline",
]

_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _ingest_supplement(spark, n_rows: int = 200_000, n_files: int = 8) -> dict:
    import shutil
    import tempfile

    from babylon_data_loader_spark.config import EngineConfig
    from babylon_data_loader_spark.ingest.pipeline import ingest
    from babylon_data_loader_spark.synthetic import (
        generate_synthetic,
        write_synthetic_csv,
    )

    root = tempfile.mkdtemp(
        prefix="_bench_ingest_",
        dir=os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "spark-warehouse"
        ),
    )
    unproc = os.path.join(root, "unprocessed")
    lake = os.path.join(root, "lake")
    os.makedirs(unproc)
    try:
        per_file = n_rows // n_files
        for i in range(n_files):
            write_synthetic_csv(
                generate_synthetic(spark, rows=per_file, seed=i),
                unproc,
                file_name=f"synthetic_{i:02d}.csv",
            )
        cfg = EngineConfig(
            unprocessed_dir=unproc,
            processed_dir=os.path.join(root, "processed"),
            lake_dir=lake,
            move_processed_files=False,
        )
        t0 = time.time()
        res = ingest(spark, cfg)
        dt = time.time() - t0
        return {
            "note": (
                "CSV → validate → key-dedup MERGE into tx lake + audit "
                "log (the reference's flagship pipeline shape)"
            ),
            "rows": res.records_uploaded,
            "files": n_files,
            "sec": round(dt, 3),
            "rows_per_sec": int(res.records_uploaded / dt) if dt > 0 else 0,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _optimized_supplement(spark, qmap, sf_dir: str, reps: int) -> dict:
    import shutil
    import tempfile

    from babylon_data_loader_spark.operators.layout import optimize_layout

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    opt_dir = tempfile.mkdtemp(
        prefix="_bench_opt_",
        dir=os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "spark-warehouse"),
    )
    try:
        t0 = time.time()
        for t in _TABLES:
            src = os.path.join(sf_dir, f"{t}.parquet")
            size = os.path.getsize(src)
            # files sized so the hot tables parallelize across cores;
            # tiny dims stay single-file (no small-file explosion).
            n_files = max(1, min(cpus, size // (512 * 1024)))
            optimize_layout(
                spark,
                src,
                os.path.join(opt_dir, f"{t}.parquet"),
                n_files=int(n_files),
            )
        stage_s = round(time.time() - t0, 3)

        timings: dict[str, float] = {}
        for name in OPTIMIZED_SUBSET:
            fn = qmap[name]
            samples = []
            for _ in range(max(1, reps)):
                t0 = time.time()
                fn(spark, opt_dir).count()
                samples.append(time.time() - t0)
            timings[name] = round(_median(samples), 3)
        return {
            "note": (
                "same queries, engine-rewritten physical layout "
                "(multi-row-group files); one-time rewrite cost in "
                "stage_sec"
            ),
            "stage_sec": stage_s,
            "queries": timings,
            "total_sec": round(sum(timings.values()), 3),
        }
    finally:
        shutil.rmtree(opt_dir, ignore_errors=True)


def _lake_multiversion_supplement(spark, sf_dir: str, reps: int) -> dict:
    """The 100 TB lake READ shape the headline lane never times (r5
    VERDICT ask #5): appends accumulate per-partition dir lists, so a
    long-lived table is read through a MULTI-dir manifest until a
    compaction folds it. Loads the sf events table in 3 batches
    (merge + 2 appends → 3 dirs per partition), times the multi-dir
    read, then times the same read post-compact()."""
    import shutil
    import tempfile

    from babylon_data_loader_spark.operators.merge import dedup_latest
    from babylon_data_loader_spark.operators.tx_lake import (
        TransactionalLake,
    )

    root = tempfile.mkdtemp(
        prefix="_bench_lakev_",
        dir=os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "spark-warehouse"
        ),
    )
    lake_path = os.path.join(root, "events_lake")
    try:
        ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        lake = TransactionalLake.open(lake_path, partition_col="event_type")
        t0 = time.time()
        for i in range(3):
            batch = ev.where(F.col("event_id") % 3 == i)
            if i == 0:
                lake.merge(
                    spark, dedup_latest(batch, ["event_id"]), ["event_id"]
                )
            else:
                lake.append(spark, batch)
        load_s = round(time.time() - t0, 3)

        def _timed_read() -> tuple[float, int]:
            samples, n = [], 0
            for _ in range(max(1, reps)):
                t0 = time.time()
                df = TransactionalLake.open(lake_path).read(spark)
                # sum(value) forces a data read, not a footer count
                n = df.agg(
                    F.count(F.lit(1)).alias("n"), F.sum("value")
                ).collect()[0]["n"]
                samples.append(time.time() - t0)
            return round(_median(samples), 3), n

        multi_s, n_rows = _timed_read()
        n_dirs = sum(
            len(dirs)
            for dirs in TransactionalLake.open(lake_path)
            .current_manifest()["partitions"]
            .values()
        )
        t0 = time.time()
        TransactionalLake.open(lake_path).compact(spark)
        compact_s = round(time.time() - t0, 3)
        compact_read_s, _ = _timed_read()
        return {
            "note": (
                "3-batch load (merge + 2 appends) → multi-dir manifest "
                "read vs the same read after compact(); the accumulated-"
                "appends shape a long-lived 100 TB table reads through"
            ),
            "rows": n_rows,
            "load_3_batches_sec": load_s,
            "data_dirs_before_compact": n_dirs,
            "multi_dir_read_sec": multi_s,
            "compact_sec": compact_s,
            "post_compact_read_sec": compact_read_s,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _skewed_dedup_supplement(spark, sf_dir: str, reps: int) -> dict:
    """The near-dup pair-generation lane under REAL key skew (r6
    VERDICT ask #8): ONE document duplicated 5,000× sends all of its
    LSH band buckets hot (≥5,001 members — 4 buckets × ~12.5M would-be
    pairs each). The ≤1000 hot-bucket guard must DROP those buckets
    (their content is exact-dedup's job, not pairwise LSH's) while the
    rest of the corpus pairs normally, and the skewed lane's wall time
    must stay in the un-skewed lane's ballpark instead of going
    quadratic. Records both lanes' times plus the guard's observable
    footprint (dropped-bucket count, pair counts)."""
    import shutil
    import tempfile

    from babylon_data_loader_spark.operators.dedup import (
        jaccard_verify,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    root = tempfile.mkdtemp(
        prefix="_bench_skew_",
        dir=os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "spark-warehouse"
        ),
    )
    skew_dir = os.path.join(root, "documents.parquet")
    try:
        base = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        )
        max_id = base.agg(F.max("doc_id")).collect()[0][0]
        hot = (
            base.orderBy("doc_id")
            .limit(1)
            .crossJoin(
                spark.range(5000).select(F.col("id").alias("_i"))
            )
            .select(
                (F.lit(max_id) + 1 + F.col("_i")).alias("doc_id"),
                *[c for c in base.columns if c != "doc_id"],
            )
        )
        base.unionByName(hot.select(*base.columns)).repartition(
            32
        ).write.parquet(skew_dir)
        skewed = spark.read.parquet(skew_dir)

        def _lane(frame) -> tuple[float, int, int]:
            t0 = time.time()
            sig = minhash_signatures(frame)
            cand = lsh_candidate_pairs(sig)
            n_pairs = jaccard_verify(
                frame, cand, threshold=0.5
            ).count()
            dt = time.time() - t0
            n_cand = lsh_candidate_pairs(sig).count()
            return dt, n_cand, n_pairs

        base_t, skew_t = [], []
        base_cand = base_pairs = skew_cand = skew_pairs = 0
        for _ in range(max(1, reps)):
            dt, base_cand, base_pairs = _lane(base)
            base_t.append(dt)
            dt, skew_cand, skew_pairs = _lane(skewed)
            skew_t.append(dt)
        # the guard's footprint: hot (band_idx, band_val) buckets in
        # the skewed corpus (metadata-scale aggregate)
        sig = minhash_signatures(skewed)
        bands = sig.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("band_idx"),
                            F.col(f"b{i}").alias("band_val"),
                        )
                        for i in range(4)
                    ]
                )
            ).alias("b"),
        ).select("b.band_idx", "b.band_val")
        n_hot = (
            bands.groupBy("band_idx", "band_val")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > 1000)
            .count()
        )
        return {
            "note": (
                "one doc duplicated 5000x -> every one of its band "
                "buckets is hot; guard drops them (quadratic-blowup "
                "bound), rest of the corpus pairs normally"
            ),
            "n_docs_base": base.count(),
            "n_docs_skewed": skewed.count(),
            "hot_buckets_dropped": n_hot,
            "base_lane_sec": round(_median(base_t), 3),
            "skew_lane_sec": round(_median(skew_t), 3),
            "base_candidates": base_cand,
            "skew_candidates": skew_cand,
            "base_pairs_j05": base_pairs,
            "skew_pairs_j05": skew_pairs,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _zorder_layout_supplement(spark, sf_dir: str, reps: int) -> dict:
    """Layout-quality tracking for the Z-ORDER lake (r7 VERDICT ask
    #8): writes the orders table into a z-ordered transactional lake
    (Morton interleave of o_totalprice x o_custkey) and records, for a
    10% band probe on EACH dimension, how many files the min/max
    sidecar left open vs the table total — plus the pruned probe time
    against the same predicate as a full-scan filter. Skipped-file
    ratios are the round-over-round layout signal; q_lake_zorder only
    asserts they engage."""
    import shutil
    import tempfile

    from babylon_data_loader_spark.operators.tx_lake import (
        TransactionalLake,
    )

    root = tempfile.mkdtemp(
        prefix="_bench_zorder_",
        dir=os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "spark-warehouse"
        ),
    )
    try:
        orders = spark.read.parquet(
            os.path.join(sf_dir, "orders.parquet")
        )
        cust_hi = int(
            orders.agg(
                (F.max("o_custkey").cast("long") / 10).cast("long")
            ).collect()[0][0]
        )
        lake = TransactionalLake(
            os.path.join(root, "orders_lake"),
            partition_col="o_orderpriority",
            stats_cols=["o_totalprice", "o_custkey"],
            zorder_by=["o_totalprice", "o_custkey"],
            cluster_files=8,
        )
        t0 = time.time()
        lake.merge(spark, orders, key=["o_orderkey"])
        stage_s = round(time.time() - t0, 3)
        total_files = len(lake.read(spark).inputFiles())

        def _probe(preds, full_pred) -> dict:
            pruned = lake.read_pruned(spark, preds)
            opened = len(pruned.inputFiles())
            pruned_t, full_t = [], []
            for _ in range(max(1, reps)):
                t0 = time.time()
                lake.read_pruned(spark, preds).where(full_pred).agg(
                    F.sum("o_totalprice")
                ).collect()
                pruned_t.append(time.time() - t0)
                t0 = time.time()
                lake.read(spark).where(full_pred).agg(
                    F.sum("o_totalprice")
                ).collect()
                full_t.append(time.time() - t0)
            return {
                "files_opened": opened,
                "files_total": total_files,
                "skip_ratio": round(1 - opened / total_files, 3)
                if total_files
                else None,
                "pruned_probe_sec": round(_median(pruned_t), 3),
                "full_scan_sec": round(_median(full_t), 3),
            }

        price = _probe(
            [("o_totalprice", 100000.0, 150000.0)],
            F.col("o_totalprice").between(100000.0, 150000.0),
        )
        cust = _probe(
            [("o_custkey", 0, cust_hi)],
            F.col("o_custkey").between(0, cust_hi),
        )
        return {
            "note": (
                "orders z-ordered on (o_totalprice, o_custkey); 10% "
                "band probe per dimension — files_opened/files_total "
                "is the layout-quality signal tracked per round"
            ),
            "stage_sec": stage_s,
            "price_band": price,
            "custkey_band": cust,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _tokwin_layout_supplement(spark, sf_dir: str, reps: int) -> dict:
    """Window-store layout probe (r9 VERDICT ask #5; widened to BOTH
    prefix widths by r10 VERDICT ask #5): the tokwin store is the
    engine's largest at-rest structure (one row per corpus token
    position), and its consumers are hash-keyed probes. Writes the
    store flat (hash-agnostic file split) and hive-partitioned by the
    first 1 AND first 2 hex chars of the window hash (16 / 256 dirs),
    then probes a fixed set of duplicated hashes against each. With a
    prefix layout, partition pruning opens only the prefix dirs the
    probe hashes live in; files_opened/files_total is the skip signal
    tracked per round. SCALING.md records 2-3 chars as the 100 TB
    setting — the 2-hex lane MEASURES that skip-ratio-vs-file-count
    tradeoff instead of asserting it (at sf0.1 the 256-dir layout
    pays its file-count overhead in write/listing cost; at 100 TB the
    same count is ~400 GB/dir, which is the point)."""
    import shutil
    import tempfile

    from babylon_data_loader_spark.operators.dedup import token_windows

    root = tempfile.mkdtemp(
        prefix="_bench_tokwin_",
        dir=os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "spark-warehouse"
        ),
    )
    try:
        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        )
        win = token_windows(docs)
        flat_p = os.path.join(root, "flat")
        t0 = time.time()
        win.repartition(16).write.parquet(flat_p)
        flat_write = round(time.time() - t0, 3)

        # fixed probe: the 8 smallest duplicated hashes (hash order is
        # content-deterministic) — the "where else does this span
        # occur" lookup the strip worklist issues
        dup = (
            spark.read.parquet(flat_p)
            .groupBy("_h")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > 1)
            .orderBy("_h")
            .limit(8)
        )
        hashes = [r["_h"] for r in dup.collect()]

        def _count_files(path: str, only_prefixes=None) -> int:
            n = 0
            for dirpath, _dirs, files in os.walk(path):
                if only_prefixes is not None:
                    base = os.path.basename(dirpath)
                    if not (
                        base.startswith("hp=")
                        and base[3:] in only_prefixes
                    ):
                        continue
                n += sum(f.endswith(".parquet") for f in files)
            return n

        flat_total = _count_files(flat_p)
        flat_t = []
        for _ in range(max(1, reps)):
            t0 = time.time()
            spark.read.parquet(flat_p).where(
                F.col("_h").isin(hashes)
            ).agg(F.count(F.lit(1))).collect()
            flat_t.append(time.time() - t0)

        per_width = {}
        for width in (1, 2):
            pref_p = os.path.join(root, f"by_prefix{width}")
            t0 = time.time()
            (
                win.withColumn("hp", F.substring("_h", 1, width))
                .repartition("hp")
                .write.partitionBy("hp")
                .parquet(pref_p)
            )
            pref_write = round(time.time() - t0, 3)
            prefixes = sorted({h[:width] for h in hashes})
            pref_total = _count_files(pref_p)
            pref_opened = _count_files(pref_p, set(prefixes))
            pref_t = []
            for _ in range(max(1, reps)):
                t0 = time.time()
                spark.read.parquet(pref_p).where(
                    F.col("hp").isin(prefixes)
                    & F.col("_h").isin(hashes)
                ).agg(F.count(F.lit(1))).collect()
                pref_t.append(time.time() - t0)
            per_width[width] = {
                "write_sec": pref_write,
                "files_total": pref_total,
                "files_opened": pref_opened,
                "skip_ratio": round(1 - pref_opened / pref_total, 3)
                if pref_total
                else None,
                "probe_sec": round(_median(pref_t), 3),
                "n_probe_prefixes": len(prefixes),
            }

        return {
            "note": (
                "token-window store written flat vs hive-partitioned "
                "by 1- AND 2-hex-char hash prefix; 8-hash dup probe "
                "— files_opened/files_total is the skip signal; "
                "2-hex is the recorded 100 TB setting (SCALING.md)"
            ),
            # 1-hex keys keep their historical names so
            # BENCH_HISTORY comparisons stay straightforward
            "write_sec_flat": flat_write,
            "write_sec_prefix": per_width[1]["write_sec"],
            "files_total_flat": flat_total,
            "files_total_prefix": per_width[1]["files_total"],
            "files_opened_prefix": per_width[1]["files_opened"],
            "skip_ratio": per_width[1]["skip_ratio"],
            "probe_sec_flat": round(_median(flat_t), 3),
            "probe_sec_prefix": per_width[1]["probe_sec"],
            "n_probe_hashes": len(hashes),
            "n_probe_prefixes": per_width[1]["n_probe_prefixes"],
            "prefix2": per_width[2],
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _driver_stage_probe(spark) -> float:
    """Fixed many-tiny-stages job (16 chained exchanges over 1k rows,
    zero data cost): its wall time is almost pure DRIVER-side per-stage
    overhead — scheduling, listener-bus, UI state. Run at suite START
    and END, the pair separates "the driver got slower as thousands of
    stages accumulated" (end >> start: stage-count-sensitive lanes
    like q_rfm_segments inflate in-suite through no fault of their
    plan) from "the lane's own cost moved" (r10 VERDICT ask #2 — the
    q_rfm_segments in-suite/isolated ratio 1.45 investigation)."""
    t0 = time.time()
    df = spark.range(1_000)
    for i in range(16):
        df = df.repartition(2 + (i % 3))
    df.selectExpr("count(*)").collect()
    return round(time.time() - t0, 3)


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--isolated-one":
        _isolated_one(
            sys.argv[2],
            sys.argv[3],
            int(sys.argv[4]) if len(sys.argv) > 4 else 3,
        )
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = build_session(app_name="babylon-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = entrymod.queries()

    # Warmup: JVM + parquet footer reads.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # Machine-calibration probe: a fixed single-thread CPU loop plus a
    # fixed tiny Spark job, both code- and data-independent. Their
    # times move ONLY with machine load, so a contended run is
    # self-evident in the recorded JSON instead of masquerading as a
    # per-query regression (r4's close-out run and r5's session-start
    # run were both flagged this way). Quiet-machine reference on this
    # box: cpu_loop ~2.1 s, spark_probe ~0.4 s.
    t0 = time.time()
    acc = 0
    for i in range(20_000_000):
        acc += i & 1023
    cpu_loop_s = round(time.time() - t0, 3)
    t0 = time.time()
    spark.range(50_000_000).selectExpr("sum(id % 7)").collect()
    spark_probe_s = round(time.time() - t0, 3)
    _driver_stage_probe(spark)  # codegen/plan warmup rep, discarded
    driver_probe_start_s = _driver_stage_probe(spark)

    # Median of 3 per query: BENCH_HISTORY shows ~2x same-commit
    # variance on single runs; the median is the round-over-round
    # comparison number (min-of-reps rewards lucky runs, a single rep
    # rewards nothing).
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    # Warm/cold store attribution: index_store logs every at-rest
    # store access; a query whose FIRST rep paid a build is "cold"
    # and its elevated median is layout state, not a code regression.
    from babylon_data_loader_spark.operators.index_store import (
        ACCESS_LOG,
    )

    store_hit: dict[str, bool] = {}
    for name in HEADLINE:
        fn = qmap[name]
        samples = []
        for rep_i in range(max(1, reps)):
            if rep_i == 0:
                del ACCESS_LOG[:]
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            samples.append(time.time() - t0)
            if rep_i == 0 and ACCESS_LOG:
                store_hit[name] = all(a["hit"] for a in ACCESS_LOG)
        timings[name] = round(_median(samples), 3)
        spread[name] = [round(s, 3) for s in samples]
        print(
            f"# {name}: median {timings[name]:.3f}s of {spread[name]} "
            f"({n} rows)",
            file=sys.stderr,
        )

    # End-of-suite twins of the start-of-suite probes: the driver
    # overhead pair localizes listener/scheduler accumulation; the
    # q_rfm_segments re-time says whether the mid-suite lane number
    # was position or plan (its reps land AFTER every other lane ran).
    driver_probe_end_s = _driver_stage_probe(spark)
    rfm_end = []
    if "q_rfm_segments" in qmap:
        for _ in range(max(1, reps)):
            t0 = time.time()
            qmap["q_rfm_segments"](spark, sf_dir).count()
            rfm_end.append(time.time() - t0)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "commit": _git_commit(),
        "n_headline": len(HEADLINE),
        "family_map": FAMILY_MAP,
        "reps": reps,
        "stat": "median",
        "samples": spread,
        "calibration": {
            "cpu_loop_s": cpu_loop_s,
            "spark_probe_s": spark_probe_s,
            "driver_stage_probe_start_s": driver_probe_start_s,
            "driver_stage_probe_end_s": driver_probe_end_s,
            "note": (
                "fixed code/data-independent probes; compare across "
                "rounds to detect machine contention before reading "
                "regressions. The driver_stage pair (same 16-exchange "
                "no-data job at suite start vs end) measures driver-"
                "side per-stage overhead accumulation — the suite-"
                "state mechanism that inflates stage-heavy lanes "
                "in-suite (r10 ask #2)"
            ),
        },
        # q_rfm_segments re-timed AFTER the whole suite: position vs
        # plan attribution for the one lane whose in-suite/isolated
        # ratio exceeded 1 in r10
        "rfm_end_of_suite": {
            "median_s": round(_median(rfm_end), 3) if rfm_end else None,
            "samples": [round(x, 3) for x in rfm_end],
            "in_suite_s": timings.get("q_rfm_segments"),
        },
        "testdata_fingerprint": _testdata_fingerprint(sf_dir),
        # Per store-backed query: did the FIRST rep find all its
        # at-rest stores warm? A false here marks the median as
        # carrying a one-time index build, not a plan regression.
        "store_hit": store_hit,
    }

    # Supplementary: end-to-end ingest throughput (CSV → validated →
    # key-deduped MERGE into the transactional lake + audit log) — the
    # reference's flagship pipeline is exactly this shape
    # (CSV → validate → bulk-upsert into Mongo, SURVEY.md §3.1), so
    # rows/sec here is the direct single-node-throughput comparison
    # the baseline asks for. The reference publishes no numbers
    # (BASELINE.md); this records ours per round.
    try:
        result["ingest"] = _ingest_supplement(spark)
    except Exception as exc:
        result["ingest_error"] = str(exc)[:200]

    # Supplementary (clearly labeled, NOT part of the headline value):
    # the same scan-bound queries against an engine-OPTIMIZED physical
    # layout (operators/layout.py — right-sized files so row groups
    # match cores). The driver's current testdata ships each table as
    # ONE row group, which serializes every scan (a one-task read);
    # this section shows what the engine's layout pass recovers, with
    # the one-time rewrite cost reported alongside.
    try:
        result["optimized_layout"] = _optimized_supplement(
            spark, qmap, sf_dir, reps
        )
    except Exception as exc:  # supplement must never break the headline
        result["optimized_layout_error"] = str(exc)[:200]
    # Supplementary: the multi-version lake read path (accumulated
    # appends → multi-dir manifest) and the post-compaction read — the
    # read shape a long-lived table converges to at 100 TB.
    try:
        result["lake_multiversion"] = _lake_multiversion_supplement(
            spark, sf_dir, reps
        )
    except Exception as exc:
        result["lake_multiversion_error"] = str(exc)[:200]
    # Supplementary: the dedup pair-generation lane under an injected
    # hot key (one doc duplicated 5000x) — witnesses the hot-bucket
    # guard bounding the quadratic blowup under real skew.
    try:
        result["skewed_dedup"] = _skewed_dedup_supplement(
            spark, sf_dir, reps
        )
    except Exception as exc:
        result["skewed_dedup_error"] = str(exc)[:200]
    # Supplementary: z-order layout quality — skipped-file ratios for
    # one 10% band probe per z-ordered dimension, tracked per round.
    try:
        result["zorder_layout"] = _zorder_layout_supplement(
            spark, sf_dir, reps
        )
    except Exception as exc:
        result["zorder_layout_error"] = str(exc)[:200]
    # Supplementary: token-window store layout — hash-prefix
    # partitioning vs flat, dup-hash probe file-skipping (r9 ask #5).
    try:
        result["tokwin_layout"] = _tokwin_layout_supplement(
            spark, sf_dir, reps
        )
    except Exception as exc:
        result["tokwin_layout_error"] = str(exc)[:200]
    # Supplementary: fresh-process isolated reruns of the queries that
    # drifted between r6 and r7 with unchanged plans — separates
    # suite-state (JVM heap/codegen-cache position) from real cost.
    try:
        result["isolated"] = _isolated_supplement(sf_dir, reps, timings)
    except Exception as exc:
        result["isolated_error"] = str(exc)[:200]
    # Round-over-round comparison against the last recorded run at the
    # same sf: per-query regressions beyond 1.5x are named explicitly
    # so a slowdown is a diff in the output, not archaeology.
    history_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_HISTORY.jsonl"
    )
    try:
        prev = None
        with open(history_path, encoding="utf-8") as fh:
            for line in fh:
                rec = json.loads(line)
                if rec.get("sf") == float(sf):
                    prev = rec
        if prev:
            result["prev_commit"] = prev.get("commit")
            regs, drift_note = _regression_report(
                timings, prev, spark_probe_s, store_hit
            )
            result["regressions"] = regs
            if drift_note:
                result["calibration_drift"] = drift_note
    except OSError:
        pass
    # Full record: humans read it on stderr; the durable copy is the
    # BENCH_HISTORY.jsonl append below.
    print(json.dumps(result), file=sys.stderr)
    # Round-over-round trail: per-query times keyed by commit, so a
    # regression diff is one jq away even as the headline set grows.
    try:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_HISTORY.jsonl",
            ),
            "a",
            encoding="utf-8",
        ) as fh:
            fh.write(json.dumps({"ts": time.time(), **result}) + "\n")
    except OSError:
        pass
    # The LAST stdout line is ONE compact JSON record sized for the
    # driver's ~2 KB stdout-tail parse window: BENCH_r12/r13 recorded
    # "parsed": null because the full result (samples + supplements,
    # hundreds of KB) was truncated mid-JSON. Totals + rounded
    # per-lane medians + the contention probes — everything the
    # round-over-round comparison needs; detail lives in the history
    # file. (~1.3 KB at 50 lanes; sized test-pinned.)
    compact = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": "sec",
        "sf": result["sf"],
        "n_headline": result["n_headline"],
        "commit": result["commit"],
        "cal": [cpu_loop_s, spark_probe_s],
        "queries": {k: round(v, 2) for k, v in timings.items()},
    }
    print(json.dumps(compact, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
