"""Round-6 second wave: feature-engineering and sampling operators a
training-data pipeline runs just before examples reach the trainer —
smoothed target encoding, per-source quantile (rank) normalization,
class-balanced downsampling, freshness-decay weighted aggregation,
and chi-squared discriminative-term selection. Every query carries a
full DuckDB oracle.

Scale notes up front:
- the per-group ranks here partition by LOW-cardinality columns
  (`source`, `lang`) — the grouped twin of the global-window
  anti-pattern — so they route through
  operators/rank.py::grouped_running_totals (range-partitioned
  two-pass scan) instead of `Window.partitionBy(few_groups)`;
  scripts/audit_plans.py enforces this.
- every scalar that parameterizes a filter or encoding (global mean,
  minimum class size, reference timestamp, corpus size) is a ONE-ROW
  aggregate broadcast into the big-side plan, never a collected
  driver constant baked into the query string — at 100 TB the scalar
  is computed where the data lives.
- cross-row money sums go through DECIMAL(20,2) (exact) and integer
  cents; decay weights are powers of two so `cents * weight` stays
  pure integer arithmetic — no float accumulation order can flip a
  row between engines.

Reference analogue: none of these exist in the reference ETL loader
(babylon_data_loader has no ML-prep surface); they extend SURVEY.md
§2's "training-data pipeline" growth track alongside round6.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from babylon_data_loader_spark.functions.text import tokens
from babylon_data_loader_spark.operators.rank import grouped_running_totals
from babylon_data_loader_spark.queries import query
from babylon_data_loader_spark.schemas import event_ts_us, load_table

_TOKENS_LOWER_SQL = r"regexp_split_to_array(trim(lower(text)), '\s+')"


@query(
    "q_target_encode",
    oracle="""
    WITH per AS (
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(20,2))) * 100
                  AS HUGEINT) AS s_cents
      FROM orders GROUP BY o_orderpriority
    ), g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS gn,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(20,2))) * 100
                  AS HUGEINT) AS gs_cents
      FROM orders
    )
    SELECT o_orderpriority, n,
           CAST(s_cents AS DOUBLE) / CAST(n * 100 AS DOUBLE)
             AS target_mean,
           CAST(s_cents * gn + 10 * gs_cents AS DOUBLE)
             / CAST(100 * gn * (n + 10) AS DOUBLE) AS target_enc
    FROM per, g
    """,
)
def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed mean target encoding of a categorical column (the
    classic m-estimate, m=10): enc = (sum_cat + m*global_mean) /
    (n_cat + m). The workhorse categorical featurizer for gradient
    models. Sums are exact DECIMAL carried as integer CENTS; each
    output is a SINGLE unrounded IEEE division of exact integer
    numerator/denominator (enc = (s*gn + m*gs) / (100*gn*(n+m)) over
    cents), so both engines agree bitwise with no round(x, 9)
    half-way build hazard. The category frame is one partial agg
    (map-side combine), the global sum a one-row broadcast, so the
    fact table is scanned once and nothing wide shuffles."""
    ords = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    dec = F.col("o_totalprice").cast("decimal(20,2)")
    per = ords.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.sum(dec).alias("_s")
    )
    g = ords.agg(
        F.count(F.lit(1)).alias("_gn"), F.sum(dec).alias("_gs")
    )
    s_cents = (F.col("_s") * 100).cast("decimal(38,0)")
    gs_cents = (F.col("_gs") * 100).cast("decimal(38,0)")
    enc_num = (s_cents * F.col("_gn") + F.lit(10) * gs_cents).cast(
        "double"
    )
    enc_den = (
        F.lit(100) * F.col("_gn") * (F.col("n") + F.lit(10))
    ).cast("double")
    return per.crossJoin(F.broadcast(g)).select(
        "o_orderpriority",
        "n",
        (
            s_cents.cast("double")
            / (F.col("n") * F.lit(100)).cast("double")
        ).alias("target_mean"),
        (enc_num / enc_den).alias("target_enc"),
    )


@query(
    "q_quantile_normalize",
    oracle="""
    WITH r AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM documents
    )
    SELECT doc_id, source, n_chars,
           CASE WHEN n > 1
                THEN CAST(rn - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE)
                ELSE 0.5 END AS qn
    FROM r
    """,
)
def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source rank (quantile) normalization of document length to
    [0, 1] — qn = (rank-1)/(n-1) under the total (n_chars, doc_id)
    order; the distribution-free feature scaling that survives skew
    and outliers. `source` is LOW-cardinality, so the per-group rank
    runs through the distributed grouped prefix scan (a plain
    partitionBy(source) window would sort each source's entire slice
    of a 100 TB corpus in one task); the per-source counts ride along
    from the same scan's metadata-size totals frame, re-derived here
    as a broadcast-joined tiny agg."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    ranked = grouped_running_totals(
        docs,
        ["source"],
        [F.col("n_chars").asc(), F.col("doc_id").asc()],
        {"rn": F.lit(1)},
    )
    cnt = docs.groupBy("source").agg(F.count(F.lit(1)).alias("_n"))
    # single unrounded IEEE division of exact integers — bit-identical
    # across engines; round(x, 9) would be the half-way build hazard
    qn = F.when(
        F.col("_n") > 1,
        (F.col("rn") - 1).cast("double")
        / (F.col("_n") - 1).cast("double"),
    ).otherwise(F.lit(0.5))
    return (
        ranked.join(F.broadcast(cnt), "source")
        .select("doc_id", "source", "n_chars", qn.alias("qn"))
    )


@query(
    "q_class_rebalance",
    oracle="""
    WITH c AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY lang
    ), k AS (
      SELECT MIN(n) AS k FROM c
    ), r AS (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    SELECT lang, doc_id, rn FROM r, k WHERE rn <= k.k
    """,
)
def q_class_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: keep exactly min-class-count docs
    per language, chosen by deterministic hash order (md5 of the key
    — a seeded uniform shuffle both engines reproduce bit-for-bit).
    The standard rebalancing step before training on a label-skewed
    corpus. `lang` is LOW-cardinality, so the per-class rank is the
    distributed grouped scan, not a per-class single-task sort; the
    cutoff k is a one-row broadcast scalar."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang"
    )
    keyed = docs.withColumn(
        "_key", F.md5(F.col("doc_id").cast("string"))
    )
    ranked = grouped_running_totals(
        keyed,
        ["lang"],
        [F.col("_key").asc(), F.col("doc_id").asc()],
        {"rn": F.lit(1)},
    )
    k = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(F.min("_n").alias("_k"))
    )
    return (
        ranked.crossJoin(F.broadcast(k))
        .filter(F.col("rn") <= F.col("_k"))
        .select("lang", "doc_id", F.col("rn").cast("long").alias("rn"))
    )


@query(
    "q_decay_weighted",
    oracle="""
    WITH base AS (
      SELECT user_id, epoch_us(ts) AS ts_us,
             CAST(CAST(value AS DECIMAL(20,2)) * 100 AS BIGINT) AS cents
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ), ref AS (
      SELECT MAX(ts_us) AS ref_us FROM base
    ), w AS (
      SELECT user_id, cents,
             CAST(power(2, 6 - LEAST(CAST(floor(
               floor((ref_us - ts_us) / 86400000000.0) / 7.0)
               AS BIGINT), 6)) AS BIGINT) AS mult
      FROM base, ref
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents * mult) AS BIGINT) AS score_x6400,
           CAST(CAST(SUM(cents * mult) AS BIGINT) AS DOUBLE)
             / 6400.0 AS decay_score
    FROM w GROUP BY user_id
    """,
)
def q_decay_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness-decay weighted engagement per user: each event's
    value is weighted by 2^-(age_weeks), capped at 6 weeks — the
    recency weighting behind freshness-aware sampling and decayed
    engagement features. Weights are POWERS OF TWO over integer cents
    (`cents * (64 >> k)`, emitted as score_x6400), so the whole
    aggregation is exact integer arithmetic — no float sum order to
    diverge between engines — and the map-side combine stays a plain
    LongType sum. The reference timestamp is a one-row broadcast MAX,
    not a driver-collected constant."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    base = ev.select(
        "user_id",
        event_ts_us(ev).alias("ts_us"),
        (F.col("value").cast("decimal(20,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    ref = base.agg(F.max("ts_us").alias("_ref_us"))
    age_days = F.floor(
        (F.col("_ref_us") - F.col("ts_us")) / F.lit(86400000000.0)
    )
    k = F.least(
        F.floor(age_days / F.lit(7.0)).cast("bigint"), F.lit(6)
    )
    mult = F.pow(F.lit(2.0), (F.lit(6) - k).cast("double")).cast("long")
    weighted = base.crossJoin(F.broadcast(ref)).select(
        "user_id", (F.col("cents") * mult).alias("_w")
    )
    agg = weighted.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_w").alias("score_x6400"),
    )
    return agg.select(
        "user_id",
        "n",
        "score_x6400",
        (F.col("score_x6400").cast("double") / F.lit(6400.0)).alias(
            "decay_score"
        ),
    )


@query(
    "q_chi2_terms",
    oracle=f"""
    WITH raw AS (
      SELECT DISTINCT doc_id, lang, unnest({_TOKENS_LOWER_SQL}) AS term
      FROM documents
    ), terms AS (
      SELECT doc_id, lang, term FROM raw WHERE term <> ''
    ), a AS (
      SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS a
      FROM terms GROUP BY lang, term
    ), tf AS (
      SELECT term, CAST(SUM(a) AS BIGINT) AS tf FROM a GROUP BY term
    ), nl AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS nl
      FROM documents GROUP BY lang
    ), nd AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents
    ), sc AS (
      SELECT a.lang, a.term, a.a,
             (CAST(nd.nd AS DOUBLE)
              * (CAST(CAST(a.a AS HUGEINT) * nd.nd
                      - CAST(tf.tf AS HUGEINT) * nl.nl AS DOUBLE)
                 * CAST(CAST(a.a AS HUGEINT) * nd.nd
                        - CAST(tf.tf AS HUGEINT) * nl.nl AS DOUBLE)))
             / ((CAST(tf.tf AS DOUBLE)
                 * CAST(nd.nd - tf.tf AS DOUBLE))
                * (CAST(nl.nl AS DOUBLE)
                   * CAST(nd.nd - nl.nl AS DOUBLE))) AS chi2
      FROM a
      JOIN tf ON tf.term = a.term
      JOIN nl ON nl.lang = a.lang
      CROSS JOIN nd
      WHERE tf.tf >= 5 AND tf.tf < nd.nd AND nl.nl < nd.nd
    )
    SELECT lang, term, a, chi2,
           CAST(row_number() OVER (PARTITION BY lang
                                   ORDER BY chi2 DESC, term ASC)
                AS BIGINT) AS chi_rank
    FROM sc
    QUALIFY row_number() OVER (PARTITION BY lang
                               ORDER BY chi2 DESC, term ASC) <= 10
    """,
)
def q_chi2_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared discriminative-term selection per language: the
    document-frequency 2x2 contingency statistic (term-in-class vs
    term-out-of-class) that ranks vocabulary for feature selection —
    the DF-based complement of q_distinctive_terms's term-frequency
    log-odds. The determinant AD-BC algebraically reduces to
    a*nd - tf*nl and is computed EXACTLY in integer arithmetic
    (DECIMAL(38,0) / HUGEINT — the centered-double form is an FMA/
    cancellation hazard, and round(x, 9) on the quotient was the r6
    half-way-case build hazard); chi2 itself is then only double
    multiplies/divides of exact operands — bit-identical across
    engines unrounded, including as the rank key. min-df 5, tf < N
    and nl < N guard every degenerate zero-margin cell. The
    top-10-per-lang window IS rank-limit pruned
    (WindowGroupLimit), so the few-group partition never serializes a
    full language onto one task; marginals are metadata-size
    broadcasts."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    terms = (
        docs.select(
            "doc_id",
            "lang",
            F.explode(tokens(F.lower(F.col("text")))).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    a = terms.groupBy("lang", "term").agg(
        F.count(F.lit(1)).alias("a")
    )
    tf = a.groupBy("term").agg(F.sum("a").alias("tf"))
    nl = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("nl"))
    nd = docs.agg(F.count(F.lit(1)).alias("nd"))
    j = (
        a.join(tf, "term")
        .join(F.broadcast(nl), "lang")
        .crossJoin(F.broadcast(nd))
        .filter(
            (F.col("tf") >= 5)
            & (F.col("tf") < F.col("nd"))
            & (F.col("nl") < F.col("nd"))
        )
    )
    # exact integer determinant: AD - BC == a*nd - tf*nl (expand the
    # 2x2 cells); DECIMAL(38,0) keeps it exact at any corpus size
    det = (
        F.col("a").cast("decimal(38,0)") * F.col("nd")
        - F.col("tf").cast("decimal(38,0)") * F.col("nl")
    ).cast("double")
    N = F.col("nd").cast("double")
    den = (F.col("tf").cast("double")
           * (F.col("nd") - F.col("tf")).cast("double")) * (
        F.col("nl").cast("double")
        * (F.col("nd") - F.col("nl")).cast("double")
    )
    sc = j.select(
        "lang",
        "term",
        "a",
        ((N * (det * det)) / den).alias("chi2"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("chi2").desc(), F.col("term").asc()
    )
    return (
        sc.withColumn(
            "chi_rank", F.row_number().over(w).cast("bigint")
        ).filter(F.col("chi_rank") <= 10)
    )
