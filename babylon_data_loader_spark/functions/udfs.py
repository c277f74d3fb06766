"""The UDF / UDAF / UDTF surface — escape hatches for semantics
built-ins can't express, all Arrow-batched (never row-at-a-time
Python in a hot path):

- :func:`weighted_avg` — pandas GROUPED_AGG UDAF.
- :class:`NGrams` — Python UDTF (Spark 4): one row in, n rows out,
  with lateral-join composition.

Prefer built-ins first (see queries/ — 67 operators, zero UDFs);
these exist for the cases that genuinely need custom logic and as the
pattern reference for plugging in tokenizers/models later.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def weighted_avg(values: pd.Series, weights: pd.Series) -> float:
    """UDAF: Σ(v·w)/Σw per group, vectorized over Arrow batches."""
    total_weight = float(weights.sum())
    if total_weight == 0.0:
        return float("nan")
    return float((values * weights).sum() / total_weight)


@udtf(returnType="pos: int, gram: string")
class NGrams:
    """UDTF: emit word n-grams of a text with positions.

    Usage:
        from pyspark.sql.functions import lit
        NGrams(lit("a b c"), lit(2))          # table-function form
        spark.udtf.register("ngrams", NGrams) # SQL: LATERAL ngrams(...)
    """

    def eval(self, text: str, n: int):  # noqa: D102
        if text is None or n is None or n <= 0:
            return
        tokens = text.split()
        for i in range(len(tokens) - n + 1):
            yield i, " ".join(tokens[i : i + n])
