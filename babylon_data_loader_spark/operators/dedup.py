"""Document deduplication operators — the training-data-pipeline
family: exact (hash groupBy), MinHash+LSH banding, n-gram Jaccard
verification, SimHash.

Scale notes (100 TB):
- exact dedup: one shuffle on a 16-byte hash key; always run first.
- LSH: per-band bucket joins, never all-pairs; hot buckets (boilerplate)
  are the hazard — AQE skew-join plus the `max_bucket_size` guard that
  drops degenerate buckets (standard practice: a bucket with thousands
  of members is boilerplate, handled by exact dedup anyway).
- Jaccard verify: only on LSH candidates, token sets via explode +
  group, not UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from babylon_data_loader_spark.functions.text import (
    fingerprint,
    minhash_band,
    shingles,
    tokens,
)


def dedup_exact(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one row per normalized-text fingerprint (min id wins)."""
    fp = fingerprint(F.col(text_col))
    keep = docs.select(F.col(id_col), fp.alias("_fp")).groupBy("_fp").agg(
        F.min(id_col).alias(id_col)
    )
    return docs.join(keep, on=id_col, how="left_semi")


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, b0..b{n-1}) deterministic MinHash signature table.

    Shingles come from lower-cased text: near-dup detection should not
    distinguish case (exact dedup already normalizes).

    PERFORMANCE: tokens and shingles are materialized as columns in
    separate Projects. Inlining `tokens(...)` into the shingle lambda
    makes every element access re-tokenize the whole document (~3
    full regex splits PER SHINGLE per band — a measured 50×
    slowdown); CollapseProject keeps multiply-referenced non-cheap
    aliases in their own stage, so this shape evaluates each step
    once per row."""
    tok = docs.select(
        id_col, tokens(F.lower(F.col(text_col))).alias("_tok")
    )
    sh = tok.select(id_col, shingles(F.col("_tok"), shingle_k).alias("_sh"))
    return sh.select(
        id_col,
        *[
            minhash_band(F.col("_sh"), i).alias(f"b{i}")
            for i in range(n_bands)
        ],
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    n_bands: int = 4,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing any band value.

    Buckets larger than `max_bucket_size` are dropped (quadratic
    blowup guard; such buckets are boilerplate best handled by exact
    dedup)."""
    bands = signatures.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.col(f"b{i}").alias("band_val"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "band.band_idx", "band.band_val")
    sized = bands
    if max_bucket_size is not None:
        # COUNT window, deliberately: its one exchange hash-partitions
        # the band rows by exactly the self-join's key, and Spark
        # REUSES that exchange for both join sides — one full-data
        # shuffle total. The tempting groupBy + broadcast-anti-join
        # alternative shuffles less for the count but leaves the band
        # rows unpartitioned, so the self-join then shuffles them
        # TWICE (measured slower at sf0.1 and strictly more shuffle
        # bytes at scale).
        sized = (
            bands.withColumn(
                "_n",
                F.count(F.lit(1)).over(
                    Window.partitionBy("band_idx", "band_val")
                ),
            )
            .filter(F.col("_n") <= max_bucket_size)
            .drop("_n")
        )
    a = sized.alias("a")
    b = sized.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .distinct()
    )


def jaccard_verify(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_k: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs; keeps pairs ≥ threshold.

    Set-based: explode distinct shingles, join twice, |A∩B| / (|A|+|B|−|A∩B|).
    """
    tok = docs.select(
        F.col(id_col).alias("_id"),
        tokens(F.lower(F.col(text_col))).alias("_tok"),
    )
    sh = tok.select(
        "_id",
        F.explode(
            F.array_distinct(shingles(F.col("_tok"), shingle_k))
        ).alias("_sh"),
    )
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_sz"))
    inter = (
        pairs.join(sh.alias("sa"), F.col("doc_a") == F.col("sa._id"))
        .join(
            sh.alias("sb"),
            (F.col("doc_b") == F.col("sb._id"))
            & (F.col("sa._sh") == F.col("sb._sh")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    return (
        inter.join(sizes.alias("za"), F.col("doc_a") == F.col("za._id"))
        .join(sizes.alias("zb"), F.col("doc_b") == F.col("zb._id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("_inter").cast("double")
                / (
                    F.col("za._sz") + F.col("zb._sz") - F.col("_inter")
                ).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def dedup_near(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """Full near-dup pipeline: signatures → LSH candidates → Jaccard
    verify → drop the higher id of each surviving pair (greedy,
    deterministic). For CHAINED duplicates (A≈B≈C where A≉C directly)
    prefer :func:`dedup_clustered`, which keeps exactly one doc per
    connected component."""
    sig = minhash_signatures(docs, text_col, id_col)
    pairs = lsh_candidate_pairs(sig, id_col)
    dup = jaccard_verify(docs, pairs, text_col, id_col, threshold)
    losers = dup.select(F.col("doc_b").alias(id_col)).distinct()
    return docs.join(losers, on=id_col, how="left_anti")


def dedup_clustered(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """Near-dup removal with CLUSTER semantics: verified pairs become
    edges, connected components assign every doc its component's min
    id, and exactly the component representative survives. Handles
    duplicate chains correctly where greedy pair-dropping keeps
    either too many docs (A≈B, B≈C, A≉C: greedy keeps A and may keep
    C) or — with unluckier id orderings — drops transitively-linked
    originals."""
    from babylon_data_loader_spark.operators.graph import (
        connected_components,
    )

    sig = minhash_signatures(docs, text_col, id_col)
    pairs = lsh_candidate_pairs(sig, id_col)
    dup = jaccard_verify(docs, pairs, text_col, id_col, threshold)
    labels = connected_components(
        docs.select(id_col),
        dup.select("doc_a", "doc_b"),
        id_col=id_col,
        src_col="doc_a",
        dst_col="doc_b",
    )
    keepers = labels.filter(F.col("id") == F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return docs.join(keepers, on=id_col, how="left_semi")
