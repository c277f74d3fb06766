"""Round-7 registry growth: corpus-engineering operators the registry
did not yet cover, written from day one under the r7 integer-key
discipline (no ``round()`` on any integer ratio or rank key; integer
cross-multiplication for thresholds; grid-scale integer division for
decimal-sum emissions — the r6 token-budget hash-fail class is
structurally impossible here).

- ``q_vocab_coverage``: how many vocabulary types cover 50/90/99% of
  the corpus token mass — the head-coverage curve that sizes a
  tokenizer's vocab. Integer cross-multiplied thresholds over the
  distributed prefix scan.
- ``q_boilerplate_ngrams``: per-source share of document n-grams that
  are corpus-boilerplate (shingles present in >25% of documents) —
  the template/chrome signal that survives exact dedup.
- ``q_length_histogram``: log2-bucketed document-length histogram per
  source via PURE-INTEGER bucketing (binary-string length), the
  sizing profile for sequence packing.
- ``q_normalization_impact``: how many extra duplicate groups each
  normalization stage (lower → trim → whitespace-collapse) discovers
  — picks the cheapest normalization that catches the dupes.
- ``q_bigram_nll``: per-document mean bigram NLL under the corpus's
  own add-one-smoothed bigram LM — the stronger perplexity-proxy
  filter one step up from q_unigram_nll.
- ``q_rrf_fusion``: reciprocal-rank fusion of a vector retriever and
  a lexical-overlap retriever — hybrid search's standard merge, with
  a PURE-INTEGER fusion score (1e12 div (60 + rank)).
- ``q_source_overlap``: pairwise source-level content overlap
  (distinct-shingle Jaccard) — which feeds crawl the same sites.
- ``q_dedup_threshold_sweep``: verified near-dup pair counts at
  Jaccard 0.5/0.6/0.7/0.8 from ONE read of the at-rest verified-pairs
  store — the threshold-sensitivity curve behind the dedup knob.

Scale notes: every corpus-sized frame is aggregated or semi-joined
before anything wide moves; the shingle family rides the shared
at-rest stores; rank scans use operators/rank.py (no global windows);
the only driver scalars are O(1) aggregates. Reference analogue: none
(the reference is a CSV->Mongo ETL loader); these extend SURVEY.md
§2's training-data growth track.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from babylon_data_loader_spark.functions.cache import persist_tracked
from babylon_data_loader_spark.functions.text import tokens
from babylon_data_loader_spark.functions.vectors import cosine
from babylon_data_loader_spark.queries import query
from babylon_data_loader_spark.queries.extra import (
    _JACCARD_SHINGLES,
    _JACCARD_TOKENS,
    _jaccard_band_sql,
)
from babylon_data_loader_spark.queries.round6 import _DOT_SQL, _norm_sql
from babylon_data_loader_spark.schemas import load_table

_TOK = _JACCARD_TOKENS  # regexp_split_to_array(trim(lower(text)), '\s+')


@query(
    "q_vocab_coverage",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_TOK}) AS term FROM documents
    ), freq AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS f FROM tok GROUP BY term
    ), cum AS (
      SELECT term, f,
             CAST(ROW_NUMBER() OVER (ORDER BY f DESC, term ASC)
                  AS BIGINT) AS rn,
             CAST(SUM(f) OVER (ORDER BY f DESC, term ASC
                               ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum_tokens
      FROM freq
    ), tot AS (
      SELECT CAST(SUM(f) AS BIGINT) AS total_tokens FROM freq
    ), lv(level) AS (
      VALUES (CAST(50 AS BIGINT)), (90), (99)
    )
    SELECT lv.level, MIN(c.rn) AS n_terms,
           MIN(c.cum_tokens) AS cum_tokens,
           MIN(t.total_tokens) AS total_tokens
    FROM cum c, tot t, lv
    WHERE c.cum_tokens * 100 >= lv.level * t.total_tokens
    GROUP BY lv.level
    ORDER BY lv.level
    """,
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary head coverage: the number of types needed to cover
    50/90/99% of corpus token mass — the curve that sizes a tokenizer
    vocabulary (a steep head means a small vocab suffices). Term
    frequencies are one map-combinable aggregate; rank and cumulative
    mass come from ONE distributed prefix scan over the vocabulary
    frame (operators/rank.py — a plain global window would serialize
    the vocab), and each coverage test is pure integer
    cross-multiplication (cum*100 >= level*total), so no float
    boundary can move a cutoff between engines."""
    from babylon_data_loader_spark.operators.rank import running_totals

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(
            F.explode(tokens(F.lower(F.col("text")))).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    order = [F.col("f").desc(), F.col("term").asc()]
    cum = running_totals(
        freq, order, {"rn": F.lit(1), "cum_tokens": F.col("f")}
    ).select(
        F.col("rn").cast("long").alias("rn"),
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
    )
    tot = freq.agg(F.sum("f").alias("total_tokens"))
    levels = spark.createDataFrame(
        [(50,), (90,), (99,)], "level BIGINT"
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(levels))
        .where(
            F.col("cum_tokens") * 100
            >= F.col("level") * F.col("total_tokens")
        )
        .groupBy("level")
        .agg(
            F.min("rn").alias("n_terms"),
            F.min("cum_tokens").alias("cum_tokens"),
            F.min("total_tokens").alias("total_tokens"),
        )
        .orderBy("level")
    )


@query(
    "q_boilerplate_ngrams",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id, unnest({_JACCARD_SHINGLES}) AS s FROM documents
      )
    ), nd AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
    ), boiler AS (
      SELECT s FROM sh, nd GROUP BY s, nd.n_docs
      HAVING COUNT(*) * 4 > nd.n_docs
    ), per AS (
      SELECT sh.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_sh,
             CAST(SUM(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_boiler
      FROM sh LEFT JOIN boiler b ON b.s = sh.s
      GROUP BY sh.doc_id
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(p.n_sh) AS BIGINT) AS n_ngrams,
           CAST(SUM(p.n_boiler) AS BIGINT) AS n_boiler,
           CAST(SUM(p.n_boiler) AS DOUBLE) / SUM(p.n_sh)
             AS boiler_rate
    FROM per p JOIN documents d ON d.doc_id = p.doc_id
    GROUP BY d.source
    ORDER BY d.source
    """,
)
def q_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate n-gram burden: the share of each
    source's document shingles that are corpus-boilerplate (present
    in more than 25% of ALL documents) — template chrome and
    navigation text that exact dedup can never remove because the
    surrounding documents differ. Rides the shared at-rest shingle
    store; the boilerplate set is a vocabulary-scale aggregate with an
    INTEGER threshold (df*4 > n_docs), and the rate is a single
    unrounded IEEE division. One id-keyed join carries the per-doc
    counts onto the source dimension."""
    from babylon_data_loader_spark.operators.dedup import (
        stored_doc_shingles,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh = persist_tracked(
        stored_doc_shingles(docs).select(
            F.col("_id").alias("doc_id"), F.col("_sh").alias("s")
        )
    )
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    boiler = (
        sh.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(nd))
        .where(F.col("df") * 4 > F.col("n_docs"))
        .select("s")
    )
    per = (
        sh.join(F.broadcast(boiler.withColumn("_b", F.lit(1))), "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.coalesce(F.sum("_b"), F.lit(0)).alias("n_boiler"),
        )
    )
    return (
        per.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_sh").alias("n_ngrams"),
            F.sum("n_boiler").alias("n_boiler"),
            (
                F.sum("n_boiler").cast("double")
                / F.sum("n_sh").cast("double")
            ).alias("boiler_rate"),
        )
        .orderBy("source")
    )


@query(
    "q_length_histogram",
    oracle="""
    SELECT source,
           CAST(length(bin(n_chars)) AS BIGINT) AS len_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY source, len_bucket
    ORDER BY source, len_bucket
    """,
)
def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed document-length histogram per source — the
    length profile that sizes sequence packing and batch shapes.
    The bucket is PURE-INTEGER arithmetic (the bit-length of n_chars
    via its binary-string representation: Spark conv(x,10,2), DuckDB
    bin(x)) — no floating log2 near a power-of-two boundary can
    disagree between engines. One map-combinable aggregate over a
    two-column projection."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.length(
        F.conv(F.col("n_chars").cast("string"), 10, 2)
    ).cast("long")
    return (
        docs.groupBy("source", bucket.alias("len_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("source", "len_bucket")
    )


@query(
    "q_normalization_impact",
    oracle="""
    WITH hashed AS (
      SELECT 'a_raw' AS stage, md5(text) AS h FROM documents
      UNION ALL
      SELECT 'b_lower', md5(lower(text)) FROM documents
      UNION ALL
      SELECT 'c_trim_lower', md5(trim(lower(text))) FROM documents
      UNION ALL
      SELECT 'd_ws_collapse',
             md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
      FROM documents
    )
    SELECT stage,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT h) AS BIGINT) AS n_distinct,
           CAST(COUNT(*) - COUNT(DISTINCT h) AS BIGINT) AS n_collapsed
    FROM hashed GROUP BY stage ORDER BY stage
    """,
)
def q_normalization_impact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """How many EXTRA duplicate documents each normalization stage
    discovers: distinct md5 counts of the raw text, lowercased,
    trimmed+lowercased, and whitespace-collapsed forms. The curation
    diagnostic that picks the cheapest normalization catching the
    dupes (if c == d, the regex pass buys nothing on this corpus).
    All four hashes are computed in ONE scan and unpivoted with
    stack(); counts are exact integers."""
    docs = load_table(spark, sf_dir, "documents")

    def h(col):
        return F.md5(col.cast("binary"))

    hashed = docs.select(
        h(F.col("text")).alias("h1"),
        h(F.lower(F.col("text"))).alias("h2"),
        h(F.trim(F.lower(F.col("text")))).alias("h3"),
        h(
            F.regexp_replace(
                F.trim(F.lower(F.col("text"))), r"\s+", " "
            )
        ).alias("h4"),
    ).select(
        F.expr(
            "stack(4, 'a_raw', h1, 'b_lower', h2, "
            "'c_trim_lower', h3, 'd_ws_collapse', h4) AS (stage, h)"
        )
    )
    return (
        hashed.groupBy("stage")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("h").alias("n_distinct"),
            (F.count(F.lit(1)) - F.countDistinct("h")).alias(
                "n_collapsed"
            ),
        )
        .orderBy("stage")
    )


@query(
    "q_bigram_nll",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, t.term, CAST(t.pos AS BIGINT) AS pos
      FROM (
        SELECT doc_id,
               generate_subscripts({_TOK}, 1) AS pos,
               unnest({_TOK}) AS term
        FROM documents
      ) t
    ), big AS (
      SELECT a.doc_id, a.term AS w1, b.term AS w2
      FROM tok a JOIN tok b
        ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    ), c12 AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM big GROUP BY w1, w2
    ), c1 AS (
      SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM big GROUP BY w1
    ), v AS (
      SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS v FROM tok
    ), terms AS (
      SELECT g.doc_id,
             CAST(round(-ln(
               (CAST(j.c12 AS DOUBLE) + 1.0)
               / (CAST(u.c1 AS DOUBLE) + vv.v)), 12)
             AS DECIMAL(28,12)) AS term_nll
      FROM big g
      JOIN c12 j ON j.w1 = g.w1 AND j.w2 = g.w2
      JOIN c1 u ON u.w1 = g.w1
      CROSS JOIN v vv
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(CAST(SUM(term_nll) * 1000000000000 AS HUGEINT)
                AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * 1000000000000.0)
             AS avg_nll
    FROM terms GROUP BY doc_id
    """,
)
def q_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy one model up from q_unigram_nll: per-document
    mean bigram negative log-likelihood under the corpus's own
    add-one-smoothed bigram LM, P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V).
    The statistical fluency filter that catches shuffled-word salad a
    unigram model scores as normal. Per-occurrence log terms are
    rounded-12 then DECIMAL-summed (partition-order-proof) and the
    mean is the grid-scale integer division — no coarser-than-grid
    round anywhere. Bigrams are an IN-ARRAY adjacent zip (one
    projection, no position self-join — adjacency is a property of
    the token array, so deriving it relationally would pay two
    id-keyed shuffles for nothing); count models are
    vocabulary-scale aggregates joined back by key."""
    docs = load_table(spark, sf_dir, "documents")
    tok_arr = persist_tracked(
        docs.select(
            "doc_id", tokens(F.lower(F.col("text"))).alias("_t")
        )
    )
    big = persist_tracked(
        tok_arr.where(F.size("_t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(2, size(_t)), "
                    "i -> struct(_t[i-2] AS w1, _t[i-1] AS w2))"
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    v = tok_arr.select(
        F.explode("_t").alias("term")
    ).agg(F.countDistinct("term").alias("v"))
    term_nll = F.round(
        -F.log(
            (F.col("c12").cast("double") + F.lit(1.0))
            / (F.col("c1").cast("double") + F.col("v"))
        ),
        12,
    ).cast("decimal(28,12)")
    return (
        big.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .select("doc_id", term_nll.alias("term_nll"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (
                (F.sum("term_nll") * 1000000000000)
                .cast("decimal(38,0)")
                .cast("double")
                / (
                    F.count(F.lit(1)).cast("double")
                    * F.lit(1000000000000.0)
                )
            ).alias("avg_nll"),
        )
    )


@query(
    "q_rrf_fusion",
    oracle=f"""
    WITH q AS (
      SELECT embedding FROM embeddings WHERE vec_id = 0
    ), vrank AS (
      SELECT a.vec_id AS doc_id,
             CAST(ROW_NUMBER() OVER (
               ORDER BY round({_DOT_SQL}
                 / ({_norm_sql('a')} * {_norm_sql('q')}), 9) DESC,
               a.vec_id ASC) AS BIGINT) AS rv
      FROM embeddings a, q
      WHERE a.vec_id <> 0
      QUALIFY rv <= 20
    ), terms AS (
      SELECT DISTINCT doc_id, unnest({_TOK}) AS term FROM documents
    ), qterms AS (
      SELECT term FROM terms WHERE doc_id = 0
    ), ov AS (
      SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM terms t JOIN qterms s ON s.term = t.term
      WHERE t.doc_id <> 0
      GROUP BY t.doc_id
    ), lrank AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (
               ORDER BY n_shared DESC, doc_id ASC) AS BIGINT) AS rl
      FROM ov
      QUALIFY rl <= 20
    ), fused AS (
      SELECT COALESCE(v.doc_id, l.doc_id) AS doc_id, v.rv, l.rl,
             COALESCE(1000000000000 // (60 + v.rv), 0)
             + COALESCE(1000000000000 // (60 + l.rl), 0)
               AS score_e12
      FROM vrank v FULL JOIN lrank l ON l.doc_id = v.doc_id
    )
    SELECT doc_id, rv, rl, score_e12,
           score_e12 / 1000000000000.0 AS rrf
    FROM fused
    ORDER BY score_e12 DESC, doc_id ASC LIMIT 10
    """,
)
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two retrievers over the same query
    document (id 0): a vector top-20 (exact cosine — at 100 TB the
    partition-pruned ANN index with the same downstream contract) and
    a lexical top-20 (distinct-token overlap). RRF is hybrid search's
    standard merge, and its score here is PURE INTEGER —
    1e12 div (60 + rank), summed — so the fused ORDER is bit-exact in
    every engine build; the emitted rrf double derives from the
    integer. Both rank lists are candidate-scale before the join;
    tokenization is restricted to nothing wider than the corpus scan
    the lexical retriever needs."""
    from babylon_data_loader_spark.operators.rank import (
        with_global_row_number,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    qvec = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_embedding")
    )
    sim = F.round(cosine(F.col("embedding"), F.col("q_embedding")), 9)
    # both rank lists ride the distributed prefix scan (operators/
    # rank.py) — a plain Window.orderBy would serialize the corpus
    vrank = (
        with_global_row_number(
            emb.where(F.col("vec_id") != 0)
            .crossJoin(F.broadcast(qvec))
            .select(F.col("vec_id").alias("doc_id"), sim.alias("_sim")),
            [F.col("_sim").desc(), F.col("doc_id").asc()],
            "rv",
        )
        .where(F.col("rv") <= 20)
        .select("doc_id", F.col("rv").cast("long").alias("rv"))
    )
    terms = docs.select(
        "doc_id",
        F.explode(tokens(F.lower(F.col("text")))).alias("term"),
    ).distinct()
    qterms = terms.where(F.col("doc_id") == 0).select("term")
    ov = (
        terms.where(F.col("doc_id") != 0)
        .join(F.broadcast(qterms), "term")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    lrank = (
        with_global_row_number(
            ov,
            [F.col("n_shared").desc(), F.col("doc_id").asc()],
            "rl",
        )
        .where(F.col("rl") <= 20)
        .select("doc_id", F.col("rl").cast("long").alias("rl"))
    )
    fused = (
        vrank.join(lrank, "doc_id", "full")
        .select(
            "doc_id",
            "rv",
            "rl",
            (
                F.coalesce(
                    F.expr(
                        "CAST(1000000000000 AS BIGINT) div (60 + rv)"
                    ),
                    F.lit(0),
                )
                + F.coalesce(
                    F.expr(
                        "CAST(1000000000000 AS BIGINT) div (60 + rl)"
                    ),
                    F.lit(0),
                )
            ).alias("score_e12"),
        )
    )
    return (
        fused.withColumn(
            "rrf", F.col("score_e12") / F.lit(1000000000000.0)
        )
        .orderBy(F.col("score_e12").desc(), F.col("doc_id").asc())
        .limit(10)
    )


@query(
    "q_source_overlap",
    oracle=f"""
    WITH ssh AS (
      SELECT DISTINCT source, s FROM (
        SELECT source, unnest({_JACCARD_SHINGLES}) AS s FROM documents
      )
    ), sizes AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS sz
      FROM ssh GROUP BY source
    ), inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM ssh a JOIN ssh b
        ON b.s = a.s AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT i.source_a, i.source_b, i.n_common,
           CAST(i.n_common AS DOUBLE)
             / CAST(za.sz + zb.sz - i.n_common AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sizes za ON za.source = i.source_a
    JOIN sizes zb ON zb.source = i.source_b
    ORDER BY i.n_common * 1000000000
             // (za.sz + zb.sz - i.n_common) DESC,
             i.source_a ASC, i.source_b ASC
    LIMIT 20
    """,
)
def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise SOURCE-level content overlap: Jaccard of the distinct
    shingle sets of each source pair — which crawl feeds are scraping
    the same underlying sites (high overlap means one of them is
    redundant acquisition cost). Source-level shingle sets are a
    grouped distinct over the shared at-rest shingle store; the pair
    intersection shuffles only (shingle, source) tuples. The top-20
    ORDER key is the INTEGER-quantized ratio (n*1e9 div union) with
    full tiebreaks; the emitted jaccard is a single unrounded IEEE
    division."""
    from babylon_data_loader_spark.operators.dedup import (
        stored_doc_shingles,
    )

    docs = load_table(spark, sf_dir, "documents")
    ssh = persist_tracked(
        stored_doc_shingles(docs)
        .join(
            docs.select(F.col("doc_id").alias("_id"), "source"), "_id"
        )
        .select("source", F.col("_sh").alias("s"))
        .distinct()
    )
    sizes = ssh.groupBy("source").agg(F.count(F.lit(1)).alias("sz"))
    # r15: pair generation INSIDE each shingle bucket (the r6 LSH
    # pair-gen shape): one shingle-keyed shuffle + collect_set + in-row
    # double explode replaces the former self-join on `s` (which
    # shuffled the persisted frame twice and built a join). Arrays are
    # bounded by the source count per shingle — the same bound the
    # self-join's per-key output already had.
    inter = (
        ssh.groupBy("s")
        .agg(F.collect_set("source").alias("_ss"))
        .where(F.size("_ss") >= 2)
        .select(F.explode("_ss").alias("source_a"), "_ss")
        .select("source_a", F.explode("_ss").alias("source_b"))
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    joined = (
        inter.join(
            F.broadcast(
                sizes.select(
                    F.col("source").alias("source_a"),
                    F.col("sz").alias("sza"),
                )
            ),
            "source_a",
        )
        .join(
            F.broadcast(
                sizes.select(
                    F.col("source").alias("source_b"),
                    F.col("sz").alias("szb"),
                )
            ),
            "source_b",
        )
    )
    union_sz = F.col("sza") + F.col("szb") - F.col("n_common")
    return (
        joined.select(
            "source_a",
            "source_b",
            "n_common",
            (F.col("n_common").cast("double") / union_sz.cast("double"))
            .alias("jaccard"),
            F.expr(
                "n_common * CAST(1000000000 AS BIGINT) "
                "div (sza + szb - n_common)"
            ).alias("_key"),
        )
        .orderBy(
            F.col("_key").desc(),
            F.col("source_a").asc(),
            F.col("source_b").asc(),
        )
        .limit(20)
        .drop("_key")
    )


_PAIRS_WITH_J_CTE = (
    """
    WITH sig AS (
      SELECT doc_id, """
    + ", ".join(f"{_jaccard_band_sql(i)} AS b{i}" for i in range(4))
    + """
      FROM documents
    ), bands AS (
    """
    + "\nUNION ALL\n".join(
        f"SELECT doc_id, {i} AS bi, b{i} AS bv FROM sig"
        for i in range(4)
    )
    + f"""
    ), sized AS (
      SELECT doc_id, bi, bv FROM bands
      QUALIFY COUNT(*) OVER (PARTITION BY bi, bv) <= 1000
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sized a JOIN sized b
        ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
    ), sh AS (
      SELECT doc_id, unnest({_JACCARD_SHINGLES}) AS s FROM documents
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS i
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.doc_a
      JOIN sh sb ON sb.doc_id = c.doc_b AND sb.s = sa.s
      GROUP BY c.doc_a, c.doc_b
    ), pairs AS (
      SELECT i.doc_a, i.doc_b,
             CAST(i.i AS DOUBLE)
               / CAST(za.sz + zb.sz - i.i AS DOUBLE) AS jaccard
      FROM inter i
      JOIN sizes za ON za.doc_id = i.doc_a
      JOIN sizes zb ON zb.doc_id = i.doc_b
      WHERE CAST(i.i AS DOUBLE)
            / CAST(za.sz + zb.sz - i.i AS DOUBLE) >= 0.5
    )"""
)


@query(
    "q_dedup_threshold_sweep",
    oracle=_PAIRS_WITH_J_CTE
    + """, th(t) AS (
      VALUES (CAST(5 AS BIGINT)), (6), (7), (8)
    )
    SELECT th.t,
           CAST(th.t AS DOUBLE) / CAST(10.0 AS DOUBLE) AS threshold,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs, th
    WHERE pairs.jaccard * 10 >= th.t
    GROUP BY th.t ORDER BY th.t
    """,
)
def q_dedup_threshold_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Near-dup pair counts at Jaccard thresholds 0.5/0.6/0.7/0.8
    from ONE read of the at-rest verified-pairs store — the
    threshold-sensitivity curve that justifies (or indicts) the dedup
    knob: a cliff between 0.5 and 0.6 means the corpus is full of
    borderline templates. Threshold tests compare the stored exact
    ratio against t/10 via jaccard*10 >= t with BIGINT t — both
    engines evaluate the identical doubles, and the store side is the
    single unrounded division the whole dedup family shares."""
    from babylon_data_loader_spark.operators.dedup import (
        stored_verified_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = stored_verified_pairs(docs)
    th = spark.createDataFrame(
        [(5,), (6,), (7,), (8,)], "t BIGINT"
    )
    return (
        pairs.crossJoin(F.broadcast(th))
        .where(F.col("jaccard") * 10 >= F.col("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            "t",
            (F.col("t") / F.lit(10.0)).alias("threshold"),
            "n_pairs",
        )
        .orderBy("t")
    )
