"""Vector (embedding) column expressions — similarity search
primitives over ARRAY<FLOAT> columns, all built-in higher-order
functions (JVM-side; no Python in the hot path).

Every element is cast to DOUBLE before arithmetic and folds run
left-to-right, so results are reproducible and match engines with the
same evaluation order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ (sequential left fold, double precision)."""
    prods = F.zip_with(
        a, b, lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm_sq(a: Column) -> Column:
    return F.aggregate(
        a,
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(norm_sq(a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def squared_l2(a: Column, b: Column) -> Column:
    """Σ (aᵢ−bᵢ)² (sequential left fold, double precision) — the
    k-means / nearest-centroid distance. Same fold shape as
    :func:`dot`, so it matches DuckDB's
    ``list_sum(list_transform(...))`` evaluation exactly."""
    diffs = F.zip_with(
        a,
        b,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def double_array_lit(xs) -> Column:
    """ARRAY<DOUBLE> literal built as ONE SQL expression instead of
    len(xs) separate F.lit py4j round-trips — constructing a 64-dim
    query-vector literal the element-wise way costs ~50-100 ms of
    driver chatter PER VECTOR, which dominates plan-build time in the
    multi-anchor ANN lanes (measured: q_rerank_ann plan construction
    1.7 s, most of it literal assembly). repr() round-trips IEEE
    doubles exactly and the D suffix pins DoubleType, so the value is
    bit-identical to the F.lit form. Falls back to element-wise lits
    for non-finite values (inf/nan have no plain SQL literal)."""
    import math

    vals = [float(x) for x in xs]
    if not all(map(math.isfinite, vals)):
        return F.array(*[F.lit(v) for v in vals])
    if not vals:
        return F.expr("CAST(array() AS ARRAY<DOUBLE>)")
    return F.expr(f"array({','.join(f'{v!r}D' for v in vals)})")
