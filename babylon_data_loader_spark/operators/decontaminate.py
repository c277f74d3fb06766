"""Benchmark decontamination: eval-set n-gram overlap over a corpus.

The train-set hygiene step of every serious LLM data pipeline (GPT-3
appendix C, PaLM, Llama): a TRAINING document is contaminated when it
shares any n-token gram with the held-out evaluation set, and the
pipeline either drops it or strips the overlapping spans (the
owner-keep machinery in operators/dedup.py handles the strip side).

Scale shape: grams shuffle as (doc id, 32-hex md5) — the ExactSubstr
family's width discipline; per-doc ``distinct`` bounds join fan-out at
the map side. Eval sets are benchmark-scale, not corpus-scale, so the
eval gram set BROADCASTS and the corpus pays one map-side gram explode
plus one broadcast hash join; no stage ever pairs corpus rows with
corpus rows. If an eval suite outgrew the broadcast threshold the
probe becomes the hp-partitioned at-rest index semi-join the tokwin
store already implements — a knob change, not a redesign.

md5 is used (not xxhash64) so DuckDB oracles can recompute every gram
decision independently; swap the hash on a deployed path where
cross-engine checkability is not needed.

Reference analogue: none (the reference is a CSV→Mongo ETL loader) —
LLM-pipeline track extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def gram_hashes(
    docs: DataFrame,
    n: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *carry_cols, h): md5 of every stride-1 n-token window of
    the whitespace-tokenized text, with the substring-family whole-doc
    fallback for sub-n-token documents (a short doc is one span, not
    zero) — the gram convention is functions/text.py::shingles, the
    ONE place the family's window/fallback semantics live. Duplicated
    grams within a doc are kept — callers that need set semantics
    apply ``distinct`` themselves. ``carry_cols`` ride the explode so
    consumers never pay an id-keyed join to recover doc-level
    attributes."""
    from babylon_data_loader_spark.functions.text import shingles

    toks = docs.select(
        id_col,
        *carry_cols,
        F.split(F.col(text_col), " ").alias("t"),
    )
    return toks.select(
        id_col,
        *carry_cols,
        F.explode(
            F.transform(shingles(F.col("t"), n), F.md5)
        ).alias("h"),
    )


def contamination_census(
    train_grams: DataFrame,
    eval_hashes: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """The census join both report shapes share: DISTINCT training
    (id, h) grams left-joined against the broadcast DISTINCT eval
    hash set (single column ``h``), aggregated to per-doc
    (n_grams, n_eval_grams, eval_gram_rate), contaminated docs only,
    ordered by id."""
    train = train_grams.select(id_col, "h").distinct()
    eval_g = eval_hashes.select("h").distinct()
    hit = F.when(F.col("e_h").isNotNull(), F.lit(1)).otherwise(
        F.lit(0)
    )
    return (
        train.join(
            F.broadcast(eval_g.withColumnRenamed("h", "e_h")),
            train["h"] == F.col("e_h"),
            "left",
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(hit).cast("long").alias("n_eval_grams"),
            (
                F.sum(hit).cast("double") / F.count(F.lit(1))
            ).alias("eval_gram_rate"),
        )
        .where(F.col("n_eval_grams") > 0)
        .orderBy(id_col)
    )


def contamination_report(
    docs: DataFrame,
    eval_pred: Column,
    n: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-TRAINING-doc contamination census against the eval slice
    selected by ``eval_pred`` (a boolean Column over ``docs``'s
    columns): distinct grams in the doc, distinct grams shared with
    the eval set, and the shared ratio — only contaminated docs
    (n_eval_grams > 0) are emitted, ordered by id. The report is what
    a curation pipeline acts on: drop the doc, or strip the spans."""
    tagged_docs = docs.withColumn(
        "_is_eval", eval_pred.cast("boolean")
    )
    grams = gram_hashes(
        tagged_docs,
        n=n,
        id_col=id_col,
        text_col=text_col,
        carry_cols=("_is_eval",),
    )
    return contamination_census(
        grams.where(~F.col("_is_eval")),
        grams.where(F.col("_is_eval")),
        id_col=id_col,
    )
