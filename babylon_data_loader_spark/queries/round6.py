"""Round-6 registry growth (r5 VERDICT ask #6): the two suggested
LLM-pipeline gaps — cross-encoder-style re-ranking over retrieved
candidates and token-budget-aware corpus sampling — plus the grouped
per-source budget twin, per-entity winsorization, MMR
diversification, skip-gram co-occurrence, NDCG evaluation,
Wilson-score source trust, the Pareto-frontier skyline, curriculum
ordering, and the ANN-index lifecycle witnesses. Every query carries
a full DuckDB oracle except the two self-certifying rows-only ones
(`q_rerank_ann`, `q_ann_index_maintenance` — each asserts its
acceptance criterion in-query and emits it as columns).

Scale notes up front:
- re-rank: the EXPENSIVE scorer runs only on |queries| x k candidate
  pairs, never the corpus — the production retriever/re-ranker shape.
  The retrieval stage here is the oracle-able brute-force cosine
  baseline; at 100 TB it is the at-rest ANN index
  (operators/similarity.py) with the same downstream contract.
- budget sampling: greedy prefix selection under a quality order is a
  RUNNING SUM — the distributed prefix scan (operators/rank.py), not
  a single-task global window; the grouped variant uses the few-group
  grouped scan. Budget comparisons are pure integer arithmetic
  (cum*2 <= total, cum*10 <= 3*total) so no float boundary can flip a
  row between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from babylon_data_loader_spark.functions.cache import persist_tracked
from babylon_data_loader_spark.functions.text import n_tokens, tokens
from babylon_data_loader_spark.functions.vectors import (
    cosine,
    double_array_lit,
)
from babylon_data_loader_spark.queries import query
from babylon_data_loader_spark.schemas import load_table

_TOKENS_LOWER_SQL = r"regexp_split_to_array(trim(lower(text)), '\s+')"

# DuckDB cosine twin (same folds as queries/vectors.py)
_DOT_SQL = (
    "list_sum(list_transform(generate_series(1, len(a.embedding)), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))"
)


def _norm_sql(tbl: str) -> str:
    return (
        f"sqrt(list_sum(list_transform({tbl}.embedding, "
        f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    )


def _exact_top20(emb: DataFrame) -> DataFrame:
    """Exact brute-force retrieval for the rerank family: top-20
    candidates per anchor (0, 1, 2) by round-9 cosine with cand_id
    tiebreak. The ONE definition behind the at-rest ``rerank_top20``
    store — q_rerank_candidates' retrieval stage and q_rerank_ann's
    recall witness are the same frame, so the corpus pass runs once
    per dataset version for both lanes."""
    anchors = emb.where(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    sim = F.round(cosine(F.col("embedding"), F.col("q_embedding")), 9)
    cand = (
        emb.crossJoin(F.broadcast(anchors))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            sim.alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("cand_id").asc()
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 20)
        .drop("rn")
    )


@query(
    "q_rerank_candidates",
    oracle=f"""
    WITH qs AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id IN (0, 1, 2)
    ), cand AS (
      SELECT q.vec_id AS query_id, a.vec_id AS cand_id,
             round({_DOT_SQL} / ({_norm_sql('a')} * {_norm_sql('q')}), 9)
               AS sim
      FROM embeddings a, qs q
      WHERE a.vec_id <> q.vec_id
    ), top20 AS (
      SELECT * FROM cand
      QUALIFY row_number() OVER (
        PARTITION BY query_id ORDER BY sim DESC, cand_id ASC) <= 20
    ), terms AS (
      SELECT DISTINCT doc_id, unnest({_TOKENS_LOWER_SQL}) AS term
      FROM documents
    ), sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms
      FROM terms GROUP BY doc_id
    ), shared AS (
      SELECT t.query_id, t.cand_id, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM top20 t
      JOIN terms tq ON tq.doc_id = t.query_id
      JOIN terms tc ON tc.doc_id = t.cand_id AND tc.term = tq.term
      GROUP BY t.query_id, t.cand_id
    ), scored AS (
      SELECT t.query_id, t.cand_id, t.sim,
             CAST(round(t.sim * 1000000000) AS BIGINT) AS sim_e9,
             CAST(COALESCE(s.n_shared, 0) AS BIGINT) * 1000000000
               // CAST(sq.n_terms + sc.n_terms
                       - COALESCE(s.n_shared, 0) AS BIGINT) AS jacc_e9
      FROM top20 t
      LEFT JOIN shared s
        ON s.query_id = t.query_id AND s.cand_id = t.cand_id
      JOIN sizes sq ON sq.doc_id = t.query_id
      JOIN sizes sc ON sc.doc_id = t.cand_id
    )
    SELECT query_id, cand_id, sim,
           jacc_e9 / 1000000000.0 AS lexical_jaccard,
           (8 * sim_e9 + 2 * jacc_e9) / 10000000000.0 AS score,
           CAST(row_number() OVER (
             PARTITION BY query_id
             ORDER BY 8 * sim_e9 + 2 * jacc_e9 DESC,
               cand_id ASC) AS BIGINT) AS rank
    FROM scored
    QUALIFY rank <= 5
    ORDER BY query_id, rank
    """,
)
def q_rerank_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: a cheap vector retriever proposes top-20
    candidates per query anchor, then a cross-encoder-style scorer —
    which needs BOTH texts, so it is orders of magnitude more
    expensive per pair — re-ranks ONLY those |queries| x 20 pairs to a
    final top-5. The scorer here is a deterministic stand-in
    (0.8*cosine + 0.2*lexical token Jaccard of the two documents);
    a learned cross-encoder drops into the same candidate-pair frame.

    Scale shape: the corpus-sized work is the retrieval scan (at
    100 TB: the partition-pruned ANN index, operators/similarity.py —
    brute-force here because the oracle must reproduce it); document
    text is joined AFTER candidate pruning, so the wide text column
    never rides a corpus-scale shuffle. Ranking uses rounded-9 scores
    with cand_id tiebreaks — no float boundary can flip the top-k."""
    from babylon_data_loader_spark.operators.index_store import (
        get_or_build_parquet,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")

    # At-rest retrieval stage (r7 VERDICT ask #4): the corpus-scale
    # scan (brute-force cosine vs 3 anchors + per-query top-20) runs
    # ONCE per dataset version; re-runs read a ≤ |queries|·20-row
    # parquet. Keyed by the embeddings-table content fingerprint like
    # every other store, so regenerated data rebuilds. r15: the SAME
    # store now also serves q_rerank_ann's exact-recall witness
    # (identical selection by construction — _exact_top20 is the one
    # definition), so the exact pass is computed once per corpus
    # version for both lanes.
    top20 = get_or_build_parquet(
        emb, "rerank_top20", "q012k20", lambda: _exact_top20(emb)
    )
    # At-rest tokenization stage: the in-play docs' distinct-term
    # table is fixed per corpus version (the candidate set is), so it
    # is stored too. The store key's lineage covers BOTH inputs —
    # documents.parquet AND the top20 store files — so regenerating
    # either rebuilds it; the ANN twin keeps live tokenization (its
    # candidate frame is in-memory, whose canonicalized plan is not a
    # stable fingerprint) and therefore can never alias onto this
    # store.
    from babylon_data_loader_spark.operators.dedup import doc_terms

    terms_plan = doc_terms(
        docs.join(
            F.broadcast(_rerank_ids_in_play(top20)),
            "doc_id",
            "left_semi",
        )
    )
    terms = get_or_build_parquet(
        terms_plan, "rerank_terms", "q012k20", lambda: terms_plan
    )
    return _cross_encoder_rerank(docs, top20, terms=terms)


def _rerank_ids_in_play(top20: DataFrame) -> DataFrame:
    """The ≤ |queries|·(k+1) distinct doc ids a candidate frame puts
    in play for cross-encoder scoring. One explode instead of a
    two-branch union (r16): the candidate frame is referenced once,
    so plans embedding a cached candidate subtree stay half the
    size."""
    return (
        top20.select(
            F.explode(F.array("query_id", "cand_id")).alias("doc_id")
        )
        .distinct()
    )


def _cross_encoder_rerank(
    docs: DataFrame, top20: DataFrame, terms: DataFrame | None = None
) -> DataFrame:
    """The second (expensive) stage shared by the exact- and
    ANN-retrieval re-rankers: score each (query_id, cand_id, sim)
    candidate pair with 0.8*cosine + 0.2*lexical-token-Jaccard of the
    two documents and keep the top-5 per query. Document text is
    joined only for the pruned candidate set. Pass ``terms`` to reuse
    an at-rest (doc_id, term) table for the in-play docs; by default
    they are tokenized live after candidate pruning."""
    # r16 (guide §1.2/§2.4): the scoring stage carries each in-play
    # doc's DISTINCT-term SET as one array column instead of an
    # exploded (doc_id, term) stream. |A∩B| and the set sizes become
    # per-row array ops (size(array_intersect)) on two broadcast
    # joins, replacing the former five joins + two aggregations
    # (shared-term count + sizes) — same values by set identity, and
    # the live path's explode+distinct SHUFFLE disappears entirely
    # (array_distinct is a narrow projection). Term-set frames are
    # candidate-scale by construction (≤ |queries|·(k+1) docs), so
    # the broadcasts stay metadata-sized at any corpus size.
    if terms is None:
        # token sets for EXACTLY the docs in play — the id list from
        # the candidate frame semi-joins the corpus (broadcast)
        # BEFORE tokenization, so no corpus-scale text work. The
        # size>0 guard reproduces the exploded form's semantics: a
        # doc whose token array is empty had no (doc_id, term) rows,
        # so it never joined — and the oracle's DISTINCT/unnest CTE
        # agrees.
        ids_in_play = _rerank_ids_in_play(top20)
        term_sets = persist_tracked(
            docs.join(F.broadcast(ids_in_play), "doc_id", "left_semi")
            .select(
                "doc_id",
                F.array_distinct(
                    tokens(F.lower(F.col("text")))
                ).alias("_terms"),
            )
            .where(F.size("_terms") > 0)
        )
    else:
        term_sets = persist_tracked(
            terms.groupBy("doc_id").agg(
                F.collect_set("term").alias("_terms")
            )
        )
    scored = (
        top20.join(
            F.broadcast(
                term_sets.select(
                    F.col("doc_id").alias("query_id"),
                    F.col("_terms").alias("_q_terms"),
                )
            ),
            "query_id",
        )
        .join(
            F.broadcast(
                term_sets.select(
                    F.col("doc_id").alias("cand_id"),
                    F.col("_terms").alias("_c_terms"),
                )
            ),
            "cand_id",
        )
        .withColumn(
            "n_shared",
            F.size(F.array_intersect("_q_terms", "_c_terms")),
        )
        .withColumn("nq", F.size("_q_terms"))
        .withColumn("nc", F.size("_c_terms"))
        .select(
            "query_id",
            "cand_id",
            "sim",
            # integer-exact rank keys (r6 VERDICT ask #2): the Jaccard
            # is a ratio of small integers, so a rounded-DOUBLE form
            # can land exactly on a half-way case (power-of-two union
            # sizes) and round differently across engine builds. The
            # quantized keys below are pure BIGINT arithmetic; sim_e9
            # re-quantizes the already-9dp-rounded sim (within 1e-5 of
            # an integer — nowhere near a .5 boundary).
            F.round(F.col("sim") * F.lit(1000000000.0))
            .cast("bigint")
            .alias("sim_e9"),
            F.expr(
                "CAST(n_shared AS BIGINT) * CAST(1000000000 AS BIGINT) "
                "div CAST(nq + nc - n_shared AS BIGINT)"
            ).alias("jacc_e9"),
        )
    )
    score_key = 8 * F.col("sim_e9") + 2 * F.col("jacc_e9")
    w2 = Window.partitionBy("query_id").orderBy(
        score_key.desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w2).cast("bigint"))
        .where(F.col("rank") <= 5)
        .select(
            "query_id",
            "cand_id",
            "sim",
            (F.col("jacc_e9") / F.lit(1000000000.0)).alias(
                "lexical_jaccard"
            ),
            (score_key / F.lit(10000000000.0)).alias("score"),
            "rank",
        )
        .orderBy("query_id", "rank")
    )


_PER_DOC_SQL = f"""
      SELECT doc_id, source,
             CAST(len({_TOKENS_LOWER_SQL}) AS BIGINT) AS nt,
             CAST(len(list_distinct({_TOKENS_LOWER_SQL})) AS BIGINT)
               * 1000000000 // CAST(len({_TOKENS_LOWER_SQL}) AS BIGINT)
               AS div_key
      FROM documents
"""


def _per_doc(docs: DataFrame) -> DataFrame:
    """(doc_id, source, nt, div_key): token count and the distinct-token
    diversity key — the repetition-aware quality order both budget
    samplers share. div_key = (n_distinct * 1e9) div n_tokens as pure
    BIGINT integer division (Spark ``div`` / DuckDB ``//``): bit-exact
    in every engine build, unlike the rounded-DOUBLE ratio it replaces
    (r6 driver hash-fail: round(nd/nt, 9) lands exactly on a half-way
    case whenever nt is a power of two >= 1024, and different DuckDB
    builds round it differently, flipping the greedy prefix order)."""
    toks = tokens(F.lower(F.col("text")))
    return docs.select(
        "doc_id",
        "source",
        F.size(toks).cast("bigint").alias("nt"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("_nd"),
    ).select(
        "doc_id",
        "source",
        "nt",
        F.expr("_nd * CAST(1000000000 AS BIGINT) div nt").alias(
            "div_key"
        ),
    )


@query(
    "q_token_budget_sample",
    oracle=f"""
    WITH per AS ({_PER_DOC_SQL}
    ), cum AS (
      SELECT doc_id, nt, div_key,
             CAST(SUM(nt) OVER (
               ORDER BY div_key DESC, doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_tokens
      FROM per
    ), tot AS (SELECT SUM(nt) AS total FROM per)
    SELECT doc_id, nt AS n_tokens, div_key, cum_tokens
    FROM cum, tot
    WHERE cum_tokens * 2 <= tot.total
    ORDER BY cum_tokens
    """,
)
def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget-aware corpus sampling: spend a fixed token budget
    (here 50% of the corpus) on the highest-quality documents first —
    quality = distinct-token diversity ratio, so repetitive boilerplate
    sinks. Greedy prefix selection under a total order IS a running
    sum: computed with the distributed two-pass prefix scan
    (operators/rank.py::running_totals), never a single-task global
    window, and the budget test is pure integer arithmetic
    (cum*2 <= total) — and since r7 the quality ORDER key is pure
    BIGINT integer division too (see _per_doc), so neither membership
    nor order can shift with an engine build. The budget scalar comes
    from the same aggregated per-doc frame (O(1) driver value, the
    documented scalar pattern)."""
    from babylon_data_loader_spark.operators.rank import running_totals

    # r8 note: the r6/r7 driver hash-fails were NOT this function —
    # the ORACLE's uncast SUM(nt) typed as HUGEINT in DuckDB and the
    # driver's value hash is type-sensitive at serialization; the
    # oracle now CASTs every output sum to BIGINT, and
    # tests/test_oracle_types.py gates the whole registry against the
    # class.
    per = persist_tracked(
        _per_doc(load_table(spark, sf_dir, "documents")).select(
            "doc_id", "nt", "div_key"
        )
    )
    total = per.agg(F.sum("nt")).first()[0] or 0
    cum = running_totals(
        per,
        [F.col("div_key").desc(), F.col("doc_id").asc()],
        {"cum_tokens": F.col("nt")},
    ).withColumn("cum_tokens", F.col("cum_tokens").cast("long"))
    return (
        cum.where(F.col("cum_tokens") * 2 <= F.lit(int(total)))
        .select(
            "doc_id",
            F.col("nt").alias("n_tokens"),
            "div_key",
            "cum_tokens",
        )
        .orderBy("cum_tokens")
    )


@query(
    "q_source_token_budget",
    oracle=f"""
    WITH per AS ({_PER_DOC_SQL}
    ), cum AS (
      SELECT source, doc_id, nt, div_key,
             CAST(SUM(nt) OVER (
               PARTITION BY source
               ORDER BY div_key DESC, doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_tokens
      FROM per
    ), tot AS (
      SELECT source, CAST(SUM(nt) AS BIGINT) AS source_total
      FROM per GROUP BY source
    )
    SELECT c.source, c.doc_id, c.nt AS n_tokens, c.cum_tokens,
           t.source_total
    FROM cum c JOIN tot t USING (source)
    WHERE c.cum_tokens * 10 <= t.source_total * 3
    ORDER BY c.source, c.cum_tokens
    """,
)
def q_source_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget allocation: each source independently
    spends 30% of its own token mass on its highest-diversity
    documents — the domain-mixture curation step that keeps one giant
    source from crowding out the rest. source is a LOW-cardinality
    dimension, so the per-source running sum uses the grouped
    distributed prefix scan (operators/rank.py::grouped_running_totals
    — a plain partitionBy window would sort each source's share of a
    100 TB corpus in one task). Budget test is integer-exact
    (cum*10 <= 3*total)."""
    from babylon_data_loader_spark.operators.rank import (
        grouped_running_totals,
    )

    per = persist_tracked(
        _per_doc(load_table(spark, sf_dir, "documents"))
    )
    cum = grouped_running_totals(
        per,
        ["source"],
        [F.col("div_key").desc(), F.col("doc_id").asc()],
        {"cum_tokens": F.col("nt")},
    ).withColumn("cum_tokens", F.col("cum_tokens").cast("long"))
    totals = per.groupBy("source").agg(
        F.sum("nt").alias("source_total")
    )
    return (
        cum.join(F.broadcast(totals), "source")
        .where(
            F.col("cum_tokens") * 10 <= F.col("source_total") * 3
        )
        .select(
            "source",
            "doc_id",
            F.col("nt").alias("n_tokens"),
            "cum_tokens",
            "source_total",
        )
        .orderBy("source", "cum_tokens")
    )


@query(
    "q_winsorize",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_id, value,
             row_number() OVER (
               PARTITION BY user_id ORDER BY value ASC, event_id ASC
             ) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM events
    ), bounds AS (
      SELECT user_id,
             MIN(CASE WHEN rn = (5 * n + 99) // 100 THEN value END)
               AS lo,
             MIN(CASE WHEN rn = (95 * n + 99) // 100 THEN value END)
               AS hi
      FROM ranked GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, e.value,
           LEAST(GREATEST(e.value, b.lo), b.hi) AS clipped
    FROM events e JOIN bounds b USING (user_id)
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user winsorization: clip each user's event values to that
    user's exact [p05, p95] order statistics (rank ceil(q*n) under the
    (value, event_id) total order — pure element SELECTION, so the
    bounds are cross-engine exact; the rank formulas are floored
    integer arithmetic, F.floor both sides). user_id cardinality grows
    with the data, so the per-user windows hash-spread across the
    cluster — no few-group hazard; one shuffle for ranks, one tiny
    bounds frame joined back by key."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    ranked = ev.select(
        "user_id",
        "event_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("user_id"))
        .alias("n"),
    )
    lo_rank = F.floor((5 * F.col("n") + 99) / 100)
    hi_rank = F.floor((95 * F.col("n") + 99) / 100)
    bounds = ranked.groupBy("user_id").agg(
        F.min(F.when(F.col("rn") == lo_rank, F.col("value"))).alias("lo"),
        F.min(F.when(F.col("rn") == hi_rank, F.col("value"))).alias("hi"),
    )
    return ev.join(bounds, "user_id").select(
        "event_id",
        "user_id",
        "value",
        F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")).alias(
            "clipped"
        ),
    )


# --- q_rerank_ann: oracle-backed since r11 ---------------------------------
# Through r10 this was rows-only ("LSH bucketing is not
# SQL-expressible") — true for the seeded-numpy float hyperplanes of
# operators/similarity.py. r11 swaps the retrieval stage onto the
# DETERMINISTIC sign-LSH of operators/det_ann.py: md5-derived integer
# hyperplanes and 1e6-quantized vectors make every bucket signature a
# pure-BIGINT computation both engines reproduce bit-for-bit, so the
# full retrieve→rerank pipeline — multi-probe candidate set, rounded
# cosine top-20, cross-encoder top-5 — pins to a DuckDB oracle, with
# per-query retrieval hits@20 vs the exact baseline riding along as
# an INTEGER witness column (r10 VERDICT ask #3). The float LSH index
# keeps its coverage via q_knn_lsh + tests/test_similarity.py.

_RA_PLANES = 8
_RA_RADIUS = 2
_RA_DIM = 64


def _rerank_ann_oracle() -> str:
    from babylon_data_loader_spark.operators.det_ann import (
        sql_int_dot,
        sql_planes_cte,
        sql_quant,
    )

    return f"""
    WITH planes AS {sql_planes_cte('annplane', _RA_PLANES, _RA_DIM)},
    qv AS (
      SELECT vec_id, {sql_quant('embedding')} AS q FROM embeddings
    ), bits AS (
      SELECT vec_id, p,
             CASE WHEN {sql_int_dot('qv.q', 'pl.c', _RA_DIM)} >= 0
                  THEN 1 ELSE 0 END AS bit
      FROM qv CROSS JOIN planes pl
    ), ham AS (
      SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
             SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS hd
      FROM bits a JOIN bits b ON b.p = a.p
      WHERE a.vec_id IN (0, 1, 2) AND b.vec_id <> a.vec_id
      GROUP BY a.vec_id, b.vec_id
    ), probed AS (
      SELECT query_id, cand_id FROM ham WHERE hd <= {_RA_RADIUS}
    ), allsim AS (
      SELECT q.vec_id AS query_id, a.vec_id AS cand_id,
             round({_DOT_SQL} / ({_norm_sql('a')} * {_norm_sql('q')}), 9)
               AS sim
      FROM embeddings a
      JOIN embeddings q ON q.vec_id IN (0, 1, 2)
      WHERE a.vec_id <> q.vec_id
    ), top20 AS (
      SELECT s.query_id, s.cand_id, s.sim
      FROM allsim s JOIN probed p
        ON p.query_id = s.query_id AND p.cand_id = s.cand_id
      QUALIFY row_number() OVER (
        PARTITION BY s.query_id ORDER BY s.sim DESC, s.cand_id ASC)
        <= 20
    ), exact20 AS (
      SELECT query_id, cand_id FROM allsim
      QUALIFY row_number() OVER (
        PARTITION BY query_id ORDER BY sim DESC, cand_id ASC) <= 20
    ), hits AS (
      SELECT t.query_id, CAST(COUNT(*) AS BIGINT) AS hits_at_20
      FROM top20 t
      JOIN exact20 e
        ON e.query_id = t.query_id AND e.cand_id = t.cand_id
      GROUP BY t.query_id
    ), terms AS (
      SELECT DISTINCT doc_id, unnest({_TOKENS_LOWER_SQL}) AS term
      FROM documents
    ), sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms
      FROM terms GROUP BY doc_id
    ), shared AS (
      SELECT t.query_id, t.cand_id, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM top20 t
      JOIN terms tq ON tq.doc_id = t.query_id
      JOIN terms tc ON tc.doc_id = t.cand_id AND tc.term = tq.term
      GROUP BY t.query_id, t.cand_id
    ), scored AS (
      SELECT t.query_id, t.cand_id, t.sim,
             CAST(round(t.sim * 1000000000) AS BIGINT) AS sim_e9,
             CAST(COALESCE(s.n_shared, 0) AS BIGINT) * 1000000000
               // CAST(sq.n_terms + sc.n_terms
                       - COALESCE(s.n_shared, 0) AS BIGINT) AS jacc_e9
      FROM top20 t
      LEFT JOIN shared s
        ON s.query_id = t.query_id AND s.cand_id = t.cand_id
      JOIN sizes sq ON sq.doc_id = t.query_id
      JOIN sizes sc ON sc.doc_id = t.cand_id
    )
    SELECT sc.query_id, sc.cand_id, sc.sim,
           jacc_e9 / 1000000000.0 AS lexical_jaccard,
           (8 * sim_e9 + 2 * jacc_e9) / 10000000000.0 AS score,
           CAST(row_number() OVER (
             PARTITION BY sc.query_id
             ORDER BY 8 * sim_e9 + 2 * jacc_e9 DESC,
               sc.cand_id ASC) AS BIGINT) AS rank,
           h.hits_at_20
    FROM scored sc JOIN hits h ON h.query_id = sc.query_id
    QUALIFY rank <= 5
    ORDER BY sc.query_id, rank
    """


@query("q_rerank_ann", oracle=_rerank_ann_oracle())
def q_rerank_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of q_rerank_candidates: multi-probe sign-LSH
    candidate retrieval (cosine only for ball members, never
    all-pairs), then the SAME cross-encoder-style scorer over only
    the probed candidates. A probe enumerates the Hamming-radius-2
    ball of each anchor's bucket driver-side (37 of 256 bucket ids
    per anchor — metadata-scale) and membership is decided ON the
    one embeddings scan: the candidate's bucket is recomputed inline
    (sign_bucket — 8 integer dot products per row, the exact
    expression the at-rest signature store is built from) and joined
    against the broadcast (anchor, bucket) literal. At this ball
    selectivity (~40% of bucket space across 3 anchors) an id-set
    structure cannot prune the scan, so recomputing the bit beats
    shuffling or broadcasting a corpus-scale candidate list (r15
    ADVICE; guide §8) — the selective-ball probe lanes (q_knn_lsh)
    keep the bucket-partitioned store path. Each output row carries
    hits_at_20 (INTEGER overlap of the probed top-20 with the exact
    top-20 for its anchor) — the oracle recomputes retrieval,
    rerank, AND the recall witness exactly, because every retrieval
    decision is md5-derived integer arithmetic
    (operators/det_ann.py)."""
    from babylon_data_loader_spark.operators.det_ann import (
        det_planes,
        hamming_ball,
        py_sign_bucket,
        quantize_vec,
        sign_bucket,
    )
    from babylon_data_loader_spark.operators.index_store import (
        get_or_build_parquet,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    planes = det_planes("annplane", _RA_PLANES, _RA_DIM)
    anchors = [0, 1, 2]
    # r15: anchor rows come from ONE filtered scan of the embeddings
    # table; their buckets are derived driver-side with the bit-exact
    # python twin of the store's sign_bucket expression
    # (det_ann.py::py_sign_bucket, store-vs-python pinned by pytest).
    # The former emb⋈sig collect paid a corpus-vs-store join job per
    # run just to read 3 bucket ids (guide §1.2/§5: metadata-scale
    # decisions should not launch data-scale jobs).
    arows = {
        r["vec_id"]: r
        for r in emb.where(F.col("vec_id").isin(anchors)).collect()
    }
    abuckets = {
        a: py_sign_bucket(arows[a]["embedding"], planes)
        for a in anchors
    }
    # The warm path computes cosine ONLY for ball members (r15; was:
    # 6 corpus-wide cosine subtrees). The exact-recall witness — a
    # pure function of (corpus fingerprint, anchors, k) — comes from
    # the SAME at-rest ``rerank_top20`` store q_rerank_candidates
    # builds (_exact_top20 is the one definition), so the corpus pass
    # behind it runs once per dataset version, not once per run
    # (guide §2.3/§2.4: move decisions onto lightweight at-rest
    # structures; never rescan the corpus for a derived constant).
    balls = {
        a: hamming_ball(abuckets[a], _RA_PLANES, _RA_RADIUS)
        for a in anchors
    }
    # probe: the (anchor, bucket) ball pairs are a metadata-scale
    # literal broadcast (ONE F.expr parse — the element-wise
    # F.struct/F.lit form cost ~1.7 s of pure py4j round-trips for
    # the ~110 pairs; the r11 _nested_lit lesson, re-measured r15:
    # 1.69 s → 0.11 s warm). r16: the candidate's bucket is computed
    # INLINE on the one embeddings scan (sign_bucket — the exact
    # expression the at-rest signature store is built from, so the
    # values are identical by construction) and ball membership is a
    # broadcast join against the tiny pair literal. The former shape
    # probed the signature store and force-broadcast the resulting
    # (query_id, cand_id) set back into the embeddings scan — but at
    # radius 2 over 8 planes the ball covers ~37/256 of bucket space
    # per anchor, so that broadcast is O(corpus), not metadata-scale
    # (the r15 ADVICE hazard: it exceeds the 8 GB broadcast cap at
    # large corpora), and repairing it with an unhinted join would
    # shuffle the embeddings table by vec_id — a full heavy-payload
    # exchange (guide §8) just to re-attach a bit the scan can
    # recompute in 8 integer dot products per row. Inline
    # recomputation keeps the corpus pass shuffle-free: the only
    # forced broadcasts left are the ball-pair and anchor literals.
    # (The bucket-partitioned signature store remains the probe
    # structure for the selective-ball lanes, e.g. q_knn_lsh.)
    ball_pairs = (
        spark.range(1)
        .select(
            F.explode(
                F.expr(
                    "array("
                    + ",".join(
                        f"named_struct('query_id', CAST({a} AS"
                        f" BIGINT), 'bucket', CAST({b} AS"
                        f" BIGINT))"
                        for a in anchors
                        for b in balls[a]
                    )
                    + ")"
                )
            ).alias("_p")
        )
        .select("_p.query_id", "_p.bucket")
    )
    anchor_frame = (
        spark.range(1)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(a).cast("bigint").alias("query_id"),
                            double_array_lit(
                                arows[a]["embedding"]
                            ).alias("q_emb"),
                        )
                        for a in anchors
                    ]
                )
            ).alias("_q")
        )
        .select("_q.query_id", "_q.q_emb")
    )
    cand_scored = (
        emb.withColumn(
            "_bucket",
            sign_bucket(quantize_vec(F.col("embedding")), planes),
        )
        .join(
            F.broadcast(ball_pairs),
            F.col("_bucket") == F.col("bucket"),
        )
        .where(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(anchor_frame), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            F.round(
                cosine(F.col("embedding"), F.col("q_emb")), 9
            ).alias("sim"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("cand_id").asc()
        )
    )
    top20 = persist_tracked(
        cand_scored.withColumn("_rn", rn)
        .where(F.col("_rn") <= 20)
        .drop("_rn")
    )
    exact20 = get_or_build_parquet(
        emb, "rerank_top20", "q012k20", lambda: _exact_top20(emb)
    ).select("query_id", "cand_id")
    hits = (
        top20.join(exact20, ["query_id", "cand_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits_at_20"))
    )
    return _cross_encoder_rerank(docs, top20).join(
        F.broadcast(hits), "query_id"
    )


@query(
    "q_mmr_diversify",
    oracle=f"""
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    rel AS (
      SELECT a.vec_id,
             round({_DOT_SQL} / ({_norm_sql('a')} * {_norm_sql('q')}), 9)
               AS rel
      FROM embeddings a, q
      WHERE a.vec_id <> 0
      ORDER BY rel DESC, a.vec_id ASC
      LIMIT 10
    ), pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round({_DOT_SQL.replace('q.embedding', 'b.embedding')}
                   / ({_norm_sql('a')} * {_norm_sql('b')}), 9) AS sim
      FROM (SELECT e.vec_id, e.embedding FROM embeddings e
            JOIN rel r ON r.vec_id = e.vec_id) a
      JOIN (SELECT e.vec_id, e.embedding FROM embeddings e
            JOIN rel r ON r.vec_id = e.vec_id) b
        ON a.vec_id <> b.vec_id
    ), s1 AS (
      SELECT vec_id, rel, CAST(NULL AS DOUBLE) AS max_sim_selected,
             rel AS mmr_score
      FROM rel ORDER BY rel DESC, vec_id ASC LIMIT 1
    ), c2 AS (
      SELECT r.vec_id, r.rel,
             MAX(p.sim) AS ms
      FROM rel r
      JOIN pairs p ON p.id_a = r.vec_id
      JOIN s1 ON p.id_b = s1.vec_id
      WHERE r.vec_id NOT IN (SELECT vec_id FROM s1)
      GROUP BY r.vec_id, r.rel
    ), s2 AS (
      SELECT vec_id, rel, ms AS max_sim_selected,
             (7 * CAST(round(rel * 1000000000) AS BIGINT)
              - 3 * CAST(round(ms * 1000000000) AS BIGINT))
               / 10000000000.0 AS mmr_score
      FROM c2
      ORDER BY 7 * CAST(round(rel * 1000000000) AS BIGINT)
               - 3 * CAST(round(ms * 1000000000) AS BIGINT) DESC,
               vec_id ASC
      LIMIT 1
    ), c3 AS (
      SELECT r.vec_id, r.rel, MAX(p.sim) AS ms
      FROM rel r
      JOIN pairs p ON p.id_a = r.vec_id
      JOIN (SELECT vec_id FROM s1 UNION ALL SELECT vec_id FROM s2) s
        ON p.id_b = s.vec_id
      WHERE r.vec_id NOT IN (
        SELECT vec_id FROM s1 UNION ALL SELECT vec_id FROM s2)
      GROUP BY r.vec_id, r.rel
    ), s3 AS (
      SELECT vec_id, rel, ms AS max_sim_selected,
             (7 * CAST(round(rel * 1000000000) AS BIGINT)
              - 3 * CAST(round(ms * 1000000000) AS BIGINT))
               / 10000000000.0 AS mmr_score
      FROM c3
      ORDER BY 7 * CAST(round(rel * 1000000000) AS BIGINT)
               - 3 * CAST(round(ms * 1000000000) AS BIGINT) DESC,
               vec_id ASC
      LIMIT 1
    )
    SELECT CAST(1 AS BIGINT) AS step, * FROM s1
    UNION ALL SELECT CAST(2 AS BIGINT), * FROM s2
    UNION ALL SELECT CAST(3 AS BIGINT), * FROM s3
    ORDER BY step
    """,
)
def q_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance: greedily pick 3 results from the
    top-10 relevance pool, each step maximizing
    0.7*relevance - 0.3*max-similarity-to-already-selected — the
    classic redundancy-aware re-ranking of retrieval output. The
    greedy recurrence is UNROLLED into the plan (the q_ewma/q_bfs_hops
    discipline — no driver-side selection loop): each step is an
    argmax (orderBy+limit over the 10-row pool) joined against the
    prior selections; pairwise similarities are computed once over the
    pruned pool (10x10, broadcast), never the corpus. The argmax key
    is pure BIGINT (7*rel_e9 - 3*ms_e9 over the quantized grid
    values) with vec_id tiebreaks, so the greedy path is
    engine-deterministic — and therefore fully DuckDB-oracle-checked
    despite being an iterative algorithm."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_embedding")
    )
    rel = persist_tracked(
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qvec))
        .select(
            "vec_id",
            "embedding",
            F.round(
                cosine(F.col("embedding"), F.col("q_embedding")), 9
            ).alias("rel"),
        )
        .orderBy(F.col("rel").desc(), F.col("vec_id").asc())
        .limit(10)
    )
    a = rel.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("emb_a"),
    )
    b = rel.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("emb_b"),
    )
    pairs = persist_tracked(
        a.join(F.broadcast(b), F.col("id_a") != F.col("id_b")).select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("emb_a"), F.col("emb_b")), 9).alias(
                "sim"
            ),
        )
    )
    pool = rel.select("vec_id", "rel")
    steps = []
    selected: DataFrame | None = None
    for step in (1, 2, 3):
        if selected is None:
            pick = (
                pool.orderBy(F.col("rel").desc(), F.col("vec_id").asc())
                .limit(1)
                .select(
                    F.lit(step).cast("bigint").alias("step"),
                    "vec_id",
                    "rel",
                    F.lit(None).cast("double").alias("max_sim_selected"),
                    F.col("rel").alias("mmr_score"),
                )
            )
        else:
            sel_ids = selected.select(
                F.col("vec_id").alias("id_b")
            )
            cand = (
                pool.join(
                    selected.select("vec_id"), "vec_id", "left_anti"
                )
                .join(pairs, pool["vec_id"] == pairs["id_a"])
                .join(F.broadcast(sel_ids), "id_b", "left_semi")
                .groupBy("vec_id", "rel")
                .agg(F.max("sim").alias("ms"))
            )
            # integer argmax key: rel/ms are 1e-9-grid values, so
            # 0.7*rel - 0.3*ms lands on the 1e-10 grid and round(x, 9)
            # of it is EXACTLY the half-way build hazard (r6
            # token-budget class); 7*rel_e9 - 3*ms_e9 is pure BIGINT
            score_key = (
                F.lit(7)
                * F.round(F.col("rel") * F.lit(1000000000.0)).cast(
                    "bigint"
                )
                - F.lit(3)
                * F.round(F.col("ms") * F.lit(1000000000.0)).cast(
                    "bigint"
                )
            )
            pick = (
                cand.withColumn("_key", score_key)
                .orderBy(F.col("_key").desc(), F.col("vec_id").asc())
                .limit(1)
                .select(
                    F.lit(step).cast("bigint").alias("step"),
                    "vec_id",
                    "rel",
                    F.col("ms").alias("max_sim_selected"),
                    (F.col("_key") / F.lit(10000000000.0)).alias(
                        "mmr_score"
                    ),
                )
            )
        pick = persist_tracked(pick)
        steps.append(pick)
        selected = (
            pick.select("vec_id")
            if selected is None
            else selected.select("vec_id").unionAll(
                pick.select("vec_id")
            )
        )
    out = steps[0]
    for s in steps[1:]:
        out = out.unionAll(s)
    return out.orderBy("step")


@query(
    "q_skipgram_pairs",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, t.term, CAST(t.pos AS BIGINT) AS pos
      FROM (
        SELECT doc_id,
               generate_subscripts({_TOKENS_LOWER_SQL}, 1) AS pos,
               unnest({_TOKENS_LOWER_SQL}) AS term
        FROM documents
      ) t
    )
    SELECT a.term AS w1, b.term AS w2,
           CAST(COUNT(*) AS BIGINT) AS n_cooc
    FROM tok a
    JOIN tok b
      ON a.doc_id = b.doc_id
     AND b.pos > a.pos AND b.pos <= a.pos + 2
    GROUP BY a.term, b.term
    HAVING COUNT(*) >= 5
    ORDER BY n_cooc DESC, w1 ASC, w2 ASC
    LIMIT 50
    """,
)
def q_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram co-occurrence counts (word2vec context windows):
    ordered token pairs within a +/-2 position window, counted over
    the corpus, support >= 5, top-50. The window is a property of the
    token ARRAY, so pairs come from one in-array transform+flatten
    projection (per-token fanout bounded by the window size) — the
    former position self-join shuffled the tokenized corpus twice by
    doc_id for the same document-local pairs. Counts are exact
    integers; ordering ties break lexicographically."""
    docs = load_table(spark, sf_dir, "documents")
    # outer i stops at size-1 and the where() guards 1-token docs:
    # Spark's sequence(a, b) DESCENDS when a > b, so an unguarded
    # empty range would fabricate reversed pairs
    pairs = docs.select(
        tokens(F.lower(F.col("text"))).alias("_t")
    ).where(F.size("_t") >= 2).select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, size(_t) - 1), i -> "
                "transform(sequence(i + 1, least(i + 2, size(_t))), "
                "j -> struct(_t[i-1] AS w1, _t[j-1] AS w2))))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    return (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_cooc"))
        .where(F.col("n_cooc") >= 5)
        .orderBy(
            F.col("n_cooc").desc(), F.col("w1").asc(), F.col("w2").asc()
        )
        .limit(50)
    )


@query("q_ann_index_maintenance")  # rows-only: index file layout is
# not SQL-expressible. Self-certifying: asserts IN-QUERY that the
# incrementally-maintained index answers every probe IDENTICALLY to a
# fresh full build, and emits the per-probe match flags as rows.
def q_ann_index_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index lifecycle a 100 TB corpus actually runs:
    build (half the vectors) → incremental append (the other half,
    operators/similarity.py::append_lsh_index — one new file per
    touched bucket, no rebuild) → compact
    (operators/index_store.py::compact_index — fold back to one file
    per bucket). After EACH maintenance step, every probed top-10 must
    equal the fresh-full-build answer bit-for-bit (bucketing is
    deterministic per vector; search re-ranks by exact cosine, so
    layout cannot change results). The query RAISES on any
    divergence; the emitted rows witness (step, probe config, match,
    files per bucket before/after compact)."""
    import os
    import shutil
    import uuid

    from babylon_data_loader_spark.operators.index_store import (
        compact_index,
    )
    from babylon_data_loader_spark.operators.similarity import (
        append_lsh_index,
        lsh_search,
        read_lsh_index,
        write_lsh_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    work = os.path.join(wh, f"_idx_maint_{uuid.uuid4().hex[:12]}")
    inc_path = os.path.join(work, "inc")
    full_path = os.path.join(work, "full")
    try:
        write_lsh_index(emb.where("vec_id % 2 = 0"), inc_path, n_planes=6)
        append_lsh_index(emb.where("vec_id % 2 = 1"), inc_path)
        write_lsh_index(emb, full_path, n_planes=6)
        qvec = [
            float(x)
            for x in emb.where("vec_id = 0").first()["embedding"]
        ]

        def probe(path: str, ph: int) -> list[tuple]:
            stored, meta = read_lsh_index(spark, path)
            return [
                tuple(r)
                for r in lsh_search(
                    stored.where("vec_id <> 0"),
                    meta,
                    qvec,
                    k=10,
                    probe_hamming=ph,
                ).collect()
            ]

        def files_per_bucket(path: str) -> int:
            import glob

            return max(
                len(glob.glob(os.path.join(d, "*.parquet")))
                for d in glob.glob(os.path.join(path, "bucket=*"))
            )

        rows = []
        want = {ph: probe(full_path, ph) for ph in (1, 2, 6)}
        pre_files = files_per_bucket(inc_path)
        for ph in (1, 2, 6):
            rows.append(
                ("append", ph, probe(inc_path, ph) == want[ph], pre_files)
            )
        compact_index(spark, inc_path, "bucket")
        post_files = files_per_bucket(inc_path)
        for ph in (1, 2, 6):
            rows.append(
                (
                    "compact",
                    ph,
                    probe(inc_path, ph) == want[ph],
                    post_files,
                )
            )
        bad = [r for r in rows if not r[2]]
        if bad or post_files != 1:
            raise AssertionError(
                f"index maintenance diverged from full build: {bad}, "
                f"files per bucket after compact = {post_files}"
            )
        return spark.createDataFrame(
            rows,
            "step STRING, probe_hamming INT, matches_full_build BOOLEAN,"
            " max_files_per_bucket INT",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


# 1/log2(rank+1) discount weights for ranks 1..5, pre-rounded to 12
# decimals and used as LITERALS in both engines — the only
# transcendental in NDCG becomes a shared constant, so the metric is
# pure multiply-add over rounded-9 gains (cross-engine exact).
_NDCG_W = [
    1.0,
    0.630929753571,
    0.5,
    0.430676558073,
    0.386852807235,
]


@query(
    "q_ndcg_eval",
    oracle=f"""
    WITH qs AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id IN (0, 1, 2)
    ), cand AS (
      SELECT q.vec_id AS query_id, a.vec_id AS cand_id,
             round({_DOT_SQL} / ({_norm_sql('a')} * {_norm_sql('q')}), 9)
               AS sim
      FROM embeddings a, qs q
      WHERE a.vec_id <> q.vec_id
    ), top20 AS (
      SELECT * FROM cand
      QUALIFY row_number() OVER (
        PARTITION BY query_id ORDER BY sim DESC, cand_id ASC) <= 20
    ), terms AS (
      SELECT DISTINCT doc_id, unnest({_TOKENS_LOWER_SQL}) AS term
      FROM documents
    ), sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms
      FROM terms GROUP BY doc_id
    ), shared AS (
      SELECT t.query_id, t.cand_id, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM top20 t
      JOIN terms tq ON tq.doc_id = t.query_id
      JOIN terms tc ON tc.doc_id = t.cand_id AND tc.term = tq.term
      GROUP BY t.query_id, t.cand_id
    ), scored AS (
      SELECT t.query_id, t.cand_id, t.sim,
             8 * CAST(round(t.sim * 1000000000) AS BIGINT)
             + 2 * (CAST(COALESCE(s.n_shared, 0) AS BIGINT)
                    * 1000000000
                    // CAST(sq.n_terms + sc.n_terms
                            - COALESCE(s.n_shared, 0) AS BIGINT))
               AS score_key
      FROM top20 t
      LEFT JOIN shared s
        ON s.query_id = t.query_id AND s.cand_id = t.cand_id
      JOIN sizes sq ON sq.doc_id = t.query_id
      JOIN sizes sc ON sc.doc_id = t.cand_id
    ), sys5 AS (
      SELECT query_id, sim,
             row_number() OVER (PARTITION BY query_id
               ORDER BY score_key DESC, cand_id ASC) AS rnk
      FROM scored QUALIFY rnk <= 5
    ), ideal5 AS (
      SELECT query_id, sim,
             row_number() OVER (PARTITION BY query_id
               ORDER BY sim DESC, cand_id ASC) AS rnk
      FROM top20 QUALIFY rnk <= 5
    ), w(rnk, wt) AS (
      VALUES (1, CAST({_NDCG_W[0]!r} AS DOUBLE)),
             (2, CAST({_NDCG_W[1]!r} AS DOUBLE)),
             (3, CAST({_NDCG_W[2]!r} AS DOUBLE)),
             (4, CAST({_NDCG_W[3]!r} AS DOUBLE)),
             (5, CAST({_NDCG_W[4]!r} AS DOUBLE)),
    ), dcg AS (
      SELECT s.query_id,
             CAST(SUM(CAST(round(s.sim * w.wt, 9)
                           AS DECIMAL(20,9))) AS DOUBLE) AS dcg
      FROM sys5 s JOIN w ON w.rnk = s.rnk GROUP BY s.query_id
    ), idcg AS (
      SELECT i.query_id,
             CAST(SUM(CAST(round(i.sim * w.wt, 9)
                           AS DECIMAL(20,9))) AS DOUBLE) AS idcg
      FROM ideal5 i JOIN w ON w.rnk = i.rnk GROUP BY i.query_id
    )
    SELECT d.query_id, d.dcg AS dcg, i.idcg AS idcg,
           d.dcg / i.idcg AS ndcg
    FROM dcg d JOIN idcg i USING (query_id)
    ORDER BY query_id
    """,
)
def q_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality evaluation of the cross-encoder re-ranker:
    NDCG@5 per query anchor, with graded relevance = the rounded-9
    cosine similarity (so the IDEAL ordering is the pure-relevance
    retrieval order and the SYSTEM ordering is the re-ranked top-5).
    The log2 discounts are pre-rounded shared literals and each gain
    term is rounded then DECIMAL-summed — the whole metric is
    cross-engine exact, a fully oracle-checked eval harness for the
    retrieval family. Work per query is O(candidate pool), never the
    corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    anchors = emb.where(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    sim = F.round(cosine(F.col("embedding"), F.col("q_embedding")), 9)
    cand = (
        emb.crossJoin(F.broadcast(anchors))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("cand_id"), sim.alias("sim")
        )
    )
    w20 = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("cand_id").asc()
    )
    top20 = persist_tracked(
        cand.withColumn("rn", F.row_number().over(w20))
        .where(F.col("rn") <= 20)
        .drop("rn")
    )
    reranked = _cross_encoder_rerank(docs, top20)

    wmap = F.create_map(
        *[
            c
            for i, wt in enumerate(_NDCG_W, start=1)
            for c in (F.lit(i), F.lit(wt))
        ]
    )

    def _dcg(frame: DataFrame, rank_col: str, out: str) -> DataFrame:
        term = F.round(
            F.col("sim") * F.element_at(wmap, F.col(rank_col).cast("int")),
            9,
        )
        return (
            frame.where(F.col(rank_col) <= 5)
            .groupBy("query_id")
            .agg(
                F.sum(term.cast("decimal(20,9)"))
                .cast("double")
                .alias(out)
            )
        )

    sys5 = _dcg(reranked, "rank", "dcg")
    ideal = top20.withColumn(
        "irank", F.row_number().over(w20)
    )
    ideal5 = _dcg(ideal, "irank", "idcg")
    return (
        sys5.join(ideal5, "query_id")
        .select(
            "query_id",
            "dcg",
            "idcg",
            # dcg/idcg are exact 1e-9-grid values (decimal sums), so
            # the quotient is an integer ratio: emit the SINGLE
            # unrounded IEEE division — round(x, 9) on it is the
            # half-way-case build hazard (r6 token-budget class)
            (F.col("dcg") / F.col("idcg")).alias("ndcg"),
        )
        .orderBy("query_id")
    )


@query(
    "q_wilson_quality",
    oracle="""
    WITH g AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN n_chars BETWEEN 200 AND 2000
                           THEN 1 ELSE 0 END) AS BIGINT) AS kept
      FROM documents GROUP BY source
    )
    SELECT source, n, kept,
           CAST(kept AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
           round((CAST(kept AS DOUBLE) / CAST(n AS DOUBLE)
                  + CAST(3.8416 AS DOUBLE) / (2.0 * n)
                  - CAST(1.96 AS DOUBLE) * sqrt(
                      (CAST(kept AS DOUBLE) / CAST(n AS DOUBLE))
                      * (1.0 - CAST(kept AS DOUBLE) / CAST(n AS DOUBLE))
                      / n
                      + CAST(3.8416 AS DOUBLE) / (4.0 * n * n)))
                 / (1.0 + CAST(3.8416 AS DOUBLE) / n), 9)
             AS wilson_lower
    FROM g
    ORDER BY wilson_lower DESC, source ASC
    """,
)
def q_wilson_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality keep-rate with a Wilson-score LOWER bound
    (z=1.96): the sample-size-aware ranking a curation pipeline uses
    to decide which sources to trust — a source with 3/3 kept ranks
    BELOW one with 80/100, which the raw rate gets backwards. All
    inputs are integer counts; z and z² are shared literals and sqrt
    is correctly-rounded IEEE in both engines, so the rounded-9 bound
    is cross-engine exact. One aggregation shuffle on the source
    dimension."""
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                F.col("n_chars").between(200, 2000), 1
            ).otherwise(0)
        ).alias("kept"),
    )
    n = F.col("n").cast("double")
    p = F.col("kept").cast("double") / n
    z2 = F.lit(3.8416)
    wilson = (
        p
        + z2 / (2.0 * n)
        - F.lit(1.96)
        * F.sqrt(p * (F.lit(1.0) - p) / n + z2 / (4.0 * n * n))
    ) / (F.lit(1.0) + z2 / n)
    return g.select(
        "source",
        "n",
        "kept",
        # kept/n is an integer ratio: single unrounded IEEE division
        # (round(x, 9) is the half-way-case build hazard); the Wilson
        # bound keeps round-9 — sqrt values never land on the grid
        p.alias("rate"),
        F.round(wilson, 9).alias("wilson_lower"),
    ).orderBy(F.col("wilson_lower").desc(), F.col("source").asc())


@query(
    "q_pareto_frontier",
    oracle=f"""
    WITH per AS ({_PER_DOC_SQL}
    )
    SELECT p.doc_id, p.div_key, p.nt AS n_tokens
    FROM per p
    WHERE NOT EXISTS (
      SELECT 1 FROM per e
      WHERE e.div_key >= p.div_key AND e.nt >= p.nt
        AND (e.div_key > p.div_key OR e.nt > p.nt)
    )
    ORDER BY p.div_key DESC, p.doc_id ASC
    """,
)
def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) selection over two quality axes —
    token-diversity ratio and document length: the documents no other
    document beats on both. The classic multi-objective curation
    operator Spark has no built-in for, computed WITHOUT the O(N²)
    dominance join the oracle uses:

    1. aggregate to one row per distinct diversity value with its max
       length (vocabulary-scale frame);
    2. distributed prefix MAX (operators/rank.py::running_max) under
       diversity-descending order gives each value the best length
       among STRICTLY more diverse docs (exclusive via a row-number
       self-join on the tiny distinct frame);
    3. a value is on the frontier iff its max length beats that
       prefix; docs join back on (diversity, length) equality.

    A doc is dominated exactly when a same-diversity doc is longer or
    a more-diverse doc is at-least-as-long, so frontier membership is
    `l == max_l(q) AND max_l(q) > prefix_max(q)` — pure integer/
    rounded-value comparisons, engine-exact."""
    from babylon_data_loader_spark.operators.rank import (
        running_max,
        with_global_row_number,
    )

    per = persist_tracked(
        _per_doc(load_table(spark, sf_dir, "documents")).select(
            "doc_id", "nt", "div_key"
        )
    )
    per_q = per.groupBy("div_key").agg(F.max("nt").alias("max_l"))
    order = [F.col("div_key").desc()]
    ranked = with_global_row_number(per_q, order, "rn")
    im = running_max(ranked, order, {"im": F.col("max_l")})
    em = im.select(
        (F.col("rn") + 1).alias("rn"), F.col("im").alias("em")
    )
    # no broadcast hint: the distinct-ratio frame is usually tiny but
    # is NOT bounded by construction (rounded-9 ratios) — let AQE pick
    frontier = (
        im.join(em, "rn", "left")
        .where(
            F.col("em").isNull() | (F.col("max_l") > F.col("em"))
        )
        .select("div_key", "max_l")
    )
    return (
        per.join(frontier, "div_key")
        .where(F.col("nt") == F.col("max_l"))
        .select(
            "doc_id",
            "div_key",
            F.col("nt").alias("n_tokens"),
        )
        .orderBy(F.col("div_key").desc(), F.col("doc_id").asc())
    )


@query(
    "q_curriculum_order",
    oracle=f"""
    WITH per AS ({_PER_DOC_SQL}
    ), tiled AS (
      SELECT doc_id, div_key,
             CAST(NTILE(4) OVER (ORDER BY div_key ASC, doc_id ASC)
                  AS BIGINT) AS stage
      FROM per
    )
    SELECT stage,
           CAST(row_number() OVER (
             PARTITION BY stage
             ORDER BY md5('cur7-' || CAST(doc_id AS VARCHAR)) ASC,
                      doc_id ASC) AS BIGINT) AS pos,
           doc_id, div_key
    FROM tiled
    ORDER BY stage, pos
    """,
)
def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum data ordering: documents staged easiest→hardest by
    diversity-quartile (the distributed two-pass NTILE — no global
    window), then DETERMINISTICALLY shuffled within each stage by a
    seeded md5 of the doc id (reproducible epochs, no RNG state; the
    q_weighted_sample discipline). Stage position comes from the
    grouped distributed prefix scan — stage has 4 values, exactly the
    few-group case a plain partitionBy window would serialize. The
    output is the training data-loader's read order."""
    from babylon_data_loader_spark.operators.rank import (
        grouped_running_totals,
        with_global_ntile,
    )

    per = persist_tracked(
        _per_doc(load_table(spark, sf_dir, "documents")).select(
            "doc_id", "div_key"
        )
    )
    tiled = with_global_ntile(
        per,
        [F.col("div_key").asc(), F.col("doc_id").asc()],
        4,
        "stage",
    ).withColumn("stage", F.col("stage").cast("bigint"))
    shuffle_key = F.md5(
        F.concat(F.lit("cur7-"), F.col("doc_id").cast("string"))
    )
    ordered = grouped_running_totals(
        tiled.withColumn("__shuf", shuffle_key),
        ["stage"],
        [F.col("__shuf").asc(), F.col("doc_id").asc()],
        {"pos": F.lit(1)},
    )
    return (
        ordered.select(
            "stage",
            F.col("pos").cast("bigint").alias("pos"),
            "doc_id",
            "div_key",
        )
        .orderBy("stage", "pos")
    )


@query(
    "q_lake_delete",
    oracle="""
    SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value
    FROM events
    WHERE event_type <> 'error' AND user_id % 7 <> 0
    """,
)
def q_lake_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Targeted deletion on the transactional lake — the GDPR /
    right-to-be-forgotten workflow: merge the events table into a
    lake partitioned by event_type, DELETE WHERE (an event-type purge,
    then a user purge across partitions), and return the surviving
    table. delete_where rewrites only partitions containing matches
    and commits atomically; the first delete drops the whole 'error'
    partition from the manifest (no rewrite of the other four), the
    second rewrites the survivors of each remaining partition. Time
    travel still sees the deleted rows until vacuum — asserted
    in-query — which is the delete-now/forget-later contract every
    transactional lake documents. The oracle is the surviving-rows
    SELECT."""
    import os
    import shutil
    import uuid

    from babylon_data_loader_spark.operators.merge import dedup_latest
    from babylon_data_loader_spark.operators.tx_lake import (
        TransactionalLake,
    )
    from babylon_data_loader_spark.schemas import event_ts_us

    ev_raw = load_table(spark, sf_dir, "events")
    ev = ev_raw.select(
        "event_id",
        "user_id",
        "event_type",
        event_ts_us(ev_raw).alias("ts_us"),
        "value",
    )
    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    work = os.path.join(wh, f"_lake_delete_{uuid.uuid4().hex[:12]}")
    try:
        lake = TransactionalLake.open(
            os.path.join(work, "events_lake"), partition_col="event_type"
        )
        lake.merge(spark, dedup_latest(ev, ["event_id"]), ["event_id"])
        v1 = lake.current_manifest()["version"]
        n1 = lake.delete_where(spark, F.col("event_type") == "error")
        n2 = lake.delete_where(spark, F.col("user_id") % 7 == 0)
        # no-match delete must not commit a version
        v_after = lake.current_manifest()["version"]
        assert lake.delete_where(spark, F.lit(False)) == 0
        if lake.current_manifest()["version"] != v_after:
            raise AssertionError("no-match delete committed a version")
        # the pre-delete snapshot still has every row (time travel)
        n_v1 = lake.read(spark, version=v1).count()
        if n_v1 != ev.count() or n1 <= 0 or n2 <= 0:
            raise AssertionError(
                f"delete accounting broken: v1={n_v1}, n1={n1}, n2={n2}"
            )
        out = lake.read(spark).select(
            "event_id", "user_id", "event_type", "ts_us", "value"
        )
        rows = out.collect()
        schema = out.schema
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(rows, schema)
