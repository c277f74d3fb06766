"""Bloom-sketch semi-join reduction from public Spark primitives.

Spark's own runtime row-group filtering (InjectRuntimeFilter) builds a
Bloom filter over the small side of a join and drops fact rows before
the shuffle — but its `bloom_filter_agg` expression is internal, not
in the public function registry. This module implements the same
pattern with registered built-ins only, so the operator works on any
stock Spark:

- **build**: each small-side key sets k bit positions
  (`pmod(xxhash64(key, seed_i), n_bits)`); the DISTINCT positions are
  collected — a set bounded by `n_bits` (a few hundred KB), never by
  the key count, which is what makes the build scale-safe at 100 TB —
  and packed into an `array<long>` bitmap.
- **probe**: the bitmap rides into the fact scan as a plain array
  literal; membership is `getbit(element_at(bitmap, word), bit)` for
  every seed — whole-stage-codegen'd JVM expressions, no UDF.

False positives pass the prefilter and are removed by the real join,
so any query using this operator stays EXACT; the sketch only shrinks
the rows that pay the shuffle. With k=2 and n_bits=2^18, ~3k keys give
a false-positive rate under 0.1%.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEEDS = (0, 7)  # k = 2 hash functions derived from seeded xxhash64


def _positions(key: Column, n_bits: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(n_bits))
        for seed in _SEEDS
    ]


def build_key_bloom(
    small: DataFrame, key_col: str, n_bits: int = 1 << 18
) -> list[int]:
    """Signed-int64 word array (len n_bits/64) with one bit set per
    (key, seed) hash. The executor-side distinct bounds the collect at
    n_bits rows regardless of key cardinality."""
    bits = (
        small.select(
            F.explode(
                F.array(*_positions(F.col(key_col), n_bits))
            ).alias("b")
        )
        .distinct()
        .collect()
    )
    words = [0] * ((n_bits + 63) // 64)
    for row in bits:
        b = row["b"]
        words[b // 64] |= 1 << (b % 64)
    # wrap to signed int64 for the Spark long literal
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def might_contain(
    words: list[int], key: Column, n_bits: int
) -> Column:
    """True iff every seeded hash bit of `key` is set in the bitmap —
    pure built-ins (element_at + getbit), codegen-friendly."""
    bitmap = F.lit(words)
    cond = F.lit(True)
    for pos in _positions(key, n_bits):
        word = F.element_at(bitmap, (pos / 64).cast("int") + 1)
        cond = cond & (F.getbit(word, pos % 64) == 1)
    return cond


def bloom_prefilter(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_bits: int = 1 << 18,
) -> DataFrame:
    """`big` reduced to rows whose key might appear in `small` —
    the explicit semi-join-reduction operator. Follow with the real
    join to drop false positives."""
    words = build_key_bloom(small, small_key, n_bits)
    return big.filter(might_contain(words, F.col(big_key), n_bits))
