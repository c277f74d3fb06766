"""Round-7 wave 3: tokenizer, dedup-QC, and vector-QC analytics.

- ``q_tokenizer_fertility``: per-source fertility of the BPE-ish
  regex tokenizer versus whitespace words (pieces per word, the
  number that predicts a tokenizer's cost on a source) — integer
  piece/word counts, one unrounded division.
- ``q_pair_label_confusion``: verified near-dup pairs joined to the
  embedding labels of both members — same-label pairs confirm the
  text-level dedup agrees with the semantic labeling; cross-label
  pairs are either mislabels or templated text spanning topics.
  The dedup-quality audit a curation pipeline runs before trusting
  cluster-collapse.
- ``q_label_cohesion``: per-label embedding cohesion — each label's
  centroid (per-dimension DECIMAL-exact mean) and the label's mean
  cosine of members to that centroid. Diffuse labels (low cohesion)
  are label-noise candidates. Every cross-row float sum follows the
  round-to-grid-then-DECIMAL rule, so the result is bit-stable under
  any partitioning and engine build.

Scale notes: fertility is one map-combinable aggregate over a
two-column projection; the confusion query joins the at-rest
verified-pairs store to a (vec_id, label) projection twice by id
(broadcast at these sizes, hash join at 100 TB — ids only);
cohesion's centroid materializes k x dim values through one grouped
aggregate (the IVF/PQ codebook pattern) and members never shuffle
wider than (id, dim, product) rows. Reference analogue: none
(CSV->Mongo ETL loader); these extend the LLM-pipeline track.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from babylon_data_loader_spark.functions.cache import persist_tracked
from babylon_data_loader_spark.queries import query
from babylon_data_loader_spark.queries.round7 import _PAIRS_WITH_J_CTE
from babylon_data_loader_spark.queries.round7b import _CLUSTERS_CTE
from babylon_data_loader_spark.schemas import load_table

#: the q_bpe_token_count tokenizer: letter runs, digit runs, single
#: non-alnum marks (the GPT-2-style pre-tokenizer shape)
_BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


@query(
    "q_tokenizer_fertility",
    oracle=rf"""
    WITH per AS (
      SELECT source,
             CAST(len(regexp_extract_all(text, '{_BPE_RE}'))
                  AS BIGINT) AS n_pieces,
             CAST(len(regexp_split_to_array(trim(text), '\s+'))
                  AS BIGINT) AS n_words
      FROM documents
    )
    SELECT source,
           CAST(SUM(n_pieces) AS BIGINT) AS total_pieces,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           CAST(SUM(n_pieces) AS DOUBLE) / SUM(n_words) AS fertility
    FROM per
    GROUP BY source
    ORDER BY source
    """,
)
def q_tokenizer_fertility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokenizer fertility per source: BPE-ish regex pieces per
    whitespace word — the multiplier that converts a source's word
    count into its real token cost (fertility near 1 = plain prose;
    high fertility = code/markup/numerals that fragment). Two integer
    counts in one scan, one unrounded division; map-combinable all
    the way."""
    docs = load_table(spark, sf_dir, "documents")
    # DataFrame API, not F.expr: a SQL string literal would process
    # the \s escape and turn the char class into [^a-z0-9s]
    n_pieces = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0)
    ).cast("long")
    n_words = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast(
        "long"
    )
    return (
        docs.select(
            "source",
            n_pieces.alias("n_pieces"),
            n_words.alias("n_words"),
        )
        .groupBy("source")
        .agg(
            F.sum("n_pieces").alias("total_pieces"),
            F.sum("n_words").alias("total_words"),
            (
                F.sum("n_pieces").cast("double")
                / F.sum("n_words").cast("double")
            ).alias("fertility"),
        )
        .orderBy("source")
    )


@query(
    "q_pair_label_confusion",
    oracle=_PAIRS_WITH_J_CTE
    + """
    SELECT LEAST(ea.label, eb.label) AS label_a,
           GREATEST(ea.label, eb.label) AS label_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN ea.label = eb.label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_same
    FROM pairs p
    JOIN embeddings ea ON ea.vec_id = p.doc_a
    JOIN embeddings eb ON eb.vec_id = p.doc_b
    GROUP BY label_a, label_b
    ORDER BY label_a, label_b
    """,
)
def q_pair_label_confusion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dedup-vs-labels audit: every verified near-dup pair (shared
    at-rest store) carries the embedding labels of both members;
    same-label pairs mean text dedup and semantic labels agree,
    cross-label pairs flag mislabels or cross-topic templates. Two
    id-keyed joins onto a (vec_id, label) projection — at 100 TB the
    pair stream is the small side and labels join hash-partitioned
    by id."""
    from babylon_data_loader_spark.operators.dedup import (
        stored_verified_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    labels = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label"
    )
    pairs = stored_verified_pairs(docs).select("doc_a", "doc_b")
    la = labels.select(
        F.col("vec_id").alias("doc_a"), F.col("label").alias("_la")
    )
    lb = labels.select(
        F.col("vec_id").alias("doc_b"), F.col("label").alias("_lb")
    )
    return (
        pairs.join(la, "doc_a")
        .join(lb, "doc_b")
        .select(
            F.least("_la", "_lb").alias("label_a"),
            F.greatest("_la", "_lb").alias("label_b"),
            (F.col("_la") == F.col("_lb")).alias("_same"),
        )
        .groupBy("label_a", "label_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.when(F.col("_same"), 1).otherwise(0)).alias(
                "n_same"
            ),
        )
        .orderBy("label_a", "label_b")
    )


@query(
    "q_label_cohesion",
    oracle="""
    WITH dims AS (
      SELECT e.label, e.vec_id, u.d,
             CAST(e.embedding[u.d] AS DOUBLE) AS v
      FROM embeddings e,
           LATERAL (SELECT unnest(generate_series(1,
                      len(e.embedding))) AS d) u
    ), cent AS (
      SELECT label, d,
             CAST(SUM(CAST(round(v, 9) AS DECIMAL(28,12)))
                  AS DOUBLE) / COUNT(*) AS c
      FROM dims GROUP BY label, d
    ), cnorm AS (
      SELECT label,
             sqrt(CAST(SUM(CAST(round(c * c, 12) AS DECIMAL(28,12)))
                       AS DOUBLE)) AS cn
      FROM cent GROUP BY label
    ), per_vec AS (
      SELECT dm.label, dm.vec_id,
             CAST(SUM(CAST(round(dm.v * ct.c, 12) AS DECIMAL(28,12)))
                  AS DOUBLE) AS dot,
             sqrt(CAST(SUM(CAST(round(dm.v * dm.v, 12)
                                AS DECIMAL(28,12)))
                       AS DOUBLE)) AS vn
      FROM dims dm
      JOIN cent ct ON ct.label = dm.label AND ct.d = dm.d
      GROUP BY dm.label, dm.vec_id
    ), cos AS (
      SELECT pv.label,
             round(pv.dot / (pv.vn * cn.cn), 9) AS c
      FROM per_vec pv JOIN cnorm cn ON cn.label = pv.label
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(c AS DECIMAL(28,12))) * 1000000000
                     AS HUGEINT) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * 1000000000.0)
             AS mean_cohesion
    FROM cos
    GROUP BY label
    ORDER BY label
    """,
)
def q_label_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding cohesion: the mean cosine of each label's
    members to the label centroid. Labels whose members barely point
    at their own centroid are label-noise candidates (the SemDeDup /
    relabeling triage signal). Numerics follow the repo's cross-engine
    rules end to end: centroid numerators are DECIMAL sums of
    rounded-9 components over ONE grouped aggregate (k x dim driver
    values — the codebook pattern); dots/norms are DECIMAL sums of
    rounded-12 per-dimension products (partition-order-proof); the
    only doubles are identical-operand IEEE divisions and sqrts; the
    final mean is a grid-scale integer-style division of a DECIMAL
    sum of rounded-9 cosines."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = persist_tracked(
        emb.select(
            "label",
            "vec_id",
            F.posexplode("embedding").alias("d0", "v0"),
        ).select(
            "label",
            "vec_id",
            (F.col("d0") + 1).alias("d"),
            F.col("v0").cast("double").alias("v"),
        )
    )
    cent = persist_tracked(
        dims.groupBy("label", "d").agg(
            (
                F.sum(F.round(F.col("v"), 9).cast("decimal(28,12)"))
                .cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("c")
        )
    )
    cnorm = cent.groupBy("label").agg(
        F.sqrt(
            F.sum(
                F.round(F.col("c") * F.col("c"), 12).cast(
                    "decimal(28,12)"
                )
            ).cast("double")
        ).alias("cn")
    )
    per_vec = (
        dims.join(cent, ["label", "d"])
        .groupBy("label", "vec_id")
        .agg(
            F.sum(
                F.round(F.col("v") * F.col("c"), 12).cast(
                    "decimal(28,12)"
                )
            )
            .cast("double")
            .alias("dot"),
            F.sqrt(
                F.sum(
                    F.round(F.col("v") * F.col("v"), 12).cast(
                        "decimal(28,12)"
                    )
                ).cast("double")
            ).alias("vn"),
        )
    )
    cos = per_vec.join(F.broadcast(cnorm), "label").select(
        "label",
        F.round(
            F.col("dot") / (F.col("vn") * F.col("cn")), 9
        ).alias("c"),
    )
    return (
        cos.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                (F.sum(F.col("c").cast("decimal(28,12)")) * 1000000000)
                .cast("decimal(38,0)")
                .cast("double")
                / (
                    F.count(F.lit(1)).cast("double")
                    * F.lit(1000000000.0)
                )
            ).alias("mean_cohesion"),
        )
        .orderBy("label")
    )


@query(
    "q_dedup_savings",
    oracle=_CLUSTERS_CTE
    + """
    , tok AS (
      SELECT doc_id, source,
             CAST(len(regexp_split_to_array(trim(lower(text)), '\\s+'))
                  AS BIGINT) AS n_tok
      FROM documents
    )
    SELECT t.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN c.cluster_id <> t.doc_id
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           CAST(SUM(t.n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN c.cluster_id <> t.doc_id
                    THEN t.n_tok ELSE 0 END) AS BIGINT)
             AS saved_tokens,
           CAST(SUM(CASE WHEN c.cluster_id <> t.doc_id
                    THEN t.n_tok ELSE 0 END) AS DOUBLE)
             / SUM(t.n_tok) AS saved_rate
    FROM tok t JOIN clusters c ON c.doc_id = t.doc_id
    GROUP BY t.source
    ORDER BY t.source
    """,
)
def q_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What near-dedup actually BUYS per source: cluster-collapse
    keeps the min-id representative of every near-dup cluster, so the
    dropped documents' token mass is the training/storage cost the
    dedup knob saves. Clusters come from the shared at-rest
    verified-pairs store + connected components (the q_dedup_clusters
    machinery); token counts are one integer aggregate; savings is
    exact integers with one unrounded division per source."""
    from babylon_data_loader_spark.functions.text import tokens
    from babylon_data_loader_spark.operators.dedup import (
        stored_doc_components,
    )

    docs = load_table(spark, sf_dir, "documents")
    # r16: labels from the shared at-rest component store (pure
    # function of the corpus version; bit-identical to the inline
    # min-label iteration it replaces)
    labels = stored_doc_components(docs).select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster_id"),
    )
    tok = docs.select(
        "doc_id",
        "source",
        F.size(tokens(F.lower(F.col("text")))).cast("long").alias(
            "n_tok"
        ),
    )
    dropped = F.when(
        F.col("cluster_id") != F.col("doc_id"), 1
    ).otherwise(0)
    saved = F.when(
        F.col("cluster_id") != F.col("doc_id"), F.col("n_tok")
    ).otherwise(F.lit(0))
    return (
        tok.join(labels, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(dropped).alias("n_dropped"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum(saved).alias("saved_tokens"),
            (
                F.sum(saved).cast("double")
                / F.sum("n_tok").cast("double")
            ).alias("saved_rate"),
        )
        .orderBy("source")
    )
