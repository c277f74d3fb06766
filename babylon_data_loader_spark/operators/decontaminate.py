"""Benchmark decontamination: eval-set n-gram overlap over a corpus.

The train-set hygiene step of every serious LLM data pipeline (GPT-3
appendix C, PaLM, Llama): a TRAINING document is contaminated when it
shares any n-token gram with the held-out evaluation set, and the
pipeline either drops it or strips the overlapping spans (the
owner-keep machinery in operators/dedup.py handles the strip side).

Tokenization is the dedup/ExactSubstr family convention —
``tokens(lower(text))``: trim, lowercase, split on ``\\s+``
(functions/text.py) — so contamination differing only in case or
whitespace is still caught, matching the normalize-then-match step of
the published procedures.

Scale shape: grams shuffle as (doc id, 32-hex md5) — the ExactSubstr
family's width discipline; per-doc ``distinct`` bounds join fan-out at
the map side. Eval sets are benchmark-scale, not corpus-scale, so the
eval gram set BROADCASTS — but the hint is guarded by a count: past
``broadcast_max_rows`` the probe degrades to a plain hash-partitioned
join on the gram hash (both sides shuffle by ``h`` — the tokwin
store's hash-prefix economics) instead of OOMing the driver, the same
guard discipline as the LSH family's hot-bucket caps. No stage ever
pairs corpus rows with corpus rows.

md5 is used (not xxhash64) so DuckDB oracles can recompute every gram
decision independently; swap the hash on a deployed path where
cross-engine checkability is not needed.

Reference analogue: none (the reference is a CSV→Mongo ETL loader) —
LLM-pipeline track extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: internal working columns — double-underscore-prefixed so a caller
#: frame with ordinary column names can never collide (this is a
#: public operator API taking caller-supplied column names).
_TOK = "__decon_tok"
_EVAL_H = "__decon_eh"
_IS_EVAL = "__decon_is_eval"

#: above this many DISTINCT eval grams the broadcast hint is dropped
#: and the census joins hash-partitioned on ``h``. 5M 32-hex hashes
#: ≈ a few hundred MB broadcast — the conventional ceiling; a full
#: benchmark suite sits orders of magnitude below it.
BROADCAST_MAX_ROWS = 5_000_000


def _check_free(taken: set[str], *needed: str) -> None:
    clash = taken & set(needed)
    if clash:
        raise ValueError(
            "decontaminate: reserved working column(s) "
            f"{sorted(clash)} collide with caller columns — rename "
            "the input columns"
        )


def gram_hashes(
    docs: DataFrame,
    n: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *carry_cols, h): md5 of every stride-1 n-token window of
    the normalized text (``tokens(lower(text))`` — trim, lowercase,
    ``\\s+`` split), with the substring-family whole-doc fallback for
    sub-n-token documents (a short doc is one span, not zero) — the
    gram convention is functions/text.py::shingles, the ONE place the
    family's window/fallback semantics live. Duplicated grams within
    a doc are kept — callers that need set semantics apply
    ``distinct`` themselves. ``carry_cols`` ride the explode so
    consumers never pay an id-keyed join to recover doc-level
    attributes. Raises if a caller column collides with the output
    gram column ``h`` or an internal working name."""
    from babylon_data_loader_spark.functions.text import (
        shingles,
        tokens,
    )

    _check_free({id_col, *carry_cols}, "h", _TOK)
    toks = docs.select(
        id_col,
        *carry_cols,
        tokens(F.lower(F.col(text_col))).alias(_TOK),
    )
    return toks.select(
        id_col,
        *carry_cols,
        F.explode(
            F.transform(shingles(F.col(_TOK), n), F.md5)
        ).alias("h"),
    )


def contamination_census(
    train_grams: DataFrame,
    eval_hashes: DataFrame,
    id_col: str = "doc_id",
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
) -> DataFrame:
    """The census join both report shapes share: DISTINCT training
    (id, h) grams left-joined against the DISTINCT eval hash set
    (single column ``h``), aggregated to per-doc
    (n_grams, n_eval_grams, eval_gram_rate), contaminated docs only,
    ordered by id. The eval side is counted once (persisted, so the
    join reuses the scan): at or below ``broadcast_max_rows`` it
    broadcasts; above, the join runs hash-partitioned on ``h`` — same
    rows out either way (pinned by a test), different shuffle
    economics."""
    from babylon_data_loader_spark.functions.cache import (
        persist_tracked,
    )

    train = train_grams.select(id_col, "h").distinct()
    eval_g = persist_tracked(
        eval_hashes.select("h").distinct()
    )
    probe = eval_g.withColumnRenamed("h", _EVAL_H)
    if eval_g.count() <= broadcast_max_rows:
        probe = F.broadcast(probe)
    hit = F.when(F.col(_EVAL_H).isNotNull(), F.lit(1)).otherwise(
        F.lit(0)
    )
    return (
        train.join(probe, train["h"] == F.col(_EVAL_H), "left")
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
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
) -> DataFrame:
    """Per-TRAINING-doc contamination census against the eval slice
    selected by ``eval_pred`` (a boolean Column over ``docs``'s
    columns): distinct grams in the doc, distinct grams shared with
    the eval set, and the shared ratio — only contaminated docs
    (n_eval_grams > 0) are emitted, ordered by id. The report is what
    a curation pipeline acts on: drop the doc, or strip the spans."""
    _check_free(set(docs.columns), _IS_EVAL)
    tagged_docs = docs.withColumn(
        _IS_EVAL, eval_pred.cast("boolean")
    )
    grams = gram_hashes(
        tagged_docs,
        n=n,
        id_col=id_col,
        text_col=text_col,
        carry_cols=(_IS_EVAL,),
    )
    return contamination_census(
        grams.where(~F.col(_IS_EVAL)),
        grams.where(F.col(_IS_EVAL)),
        id_col=id_col,
        broadcast_max_rows=broadcast_max_rows,
    )
