"""Floor-vs-truncation bucketing on negative (pre-1970) inputs.

The DuckDB oracles bucket with integer floor division (`//`); a Spark
side written as double-divide + cast('long') truncates toward zero
instead, so the two engines diverge exactly on negative
epoch-microsecond timestamps (and negative ids). This class of bug was
found twice in review (q_mv_rewrite's direct-recompute path, then
q_acf / q_seasonality_profile / q_vocab_growth) — these tests pin the
repaired expressions against Python's own floor semantics so a future
query can't quietly reintroduce the truncating form.
"""

from __future__ import annotations

from pyspark.sql import functions as F

DAY_US = 86_400_000_000
HOUR_US = 3_600_000_000

# Boundary-adjacent values on both sides of zero, plus exact
# multiples: the truncating form agrees on every non-negative value
# and disagrees on every negative non-multiple.
US_CASES = [
    -2 * DAY_US - 1,
    -DAY_US,
    -DAY_US + 1,
    -1,
    0,
    1,
    DAY_US - 1,
    DAY_US,
    1_700_000_000_000_000,  # a modern timestamp, exact under double
]


def test_floor_quotient_matches_python_floordiv(spark):
    df = spark.createDataFrame([(v,) for v in US_CASES], "us long")
    got = {
        r["us"]: (r["day"], r["hour_of_day"])
        for r in df.select(
            "us",
            F.floor(F.col("us") / F.lit(DAY_US))
            .cast("long")
            .alias("day"),
            F.floor(
                (F.col("us") % F.lit(DAY_US)) / F.lit(HOUR_US)
            )
            .cast("long")
            .alias("hour_of_day"),
        ).collect()
    }
    for v in US_CASES:
        # DuckDB: (us // DAY) and (us % DAY) // HOUR, with C-style %
        # (sign of dividend) — Python's math.fmod-like int remainder
        c_mod = v - int(v / DAY_US) * DAY_US  # truncating %, like both engines
        assert got[v] == (v // DAY_US, c_mod // HOUR_US), v


def test_truncating_form_diverges_on_negatives(spark):
    """The anti-pattern this suite guards against: double-divide +
    cast('long') truncates toward zero, so for every negative
    non-multiple it is exactly one bucket too high."""
    df = spark.createDataFrame([(-1,), (-DAY_US + 1,)], "us long")
    rows = df.select(
        (F.col("us") / F.lit(DAY_US)).cast("long").alias("trunc"),
        F.floor(F.col("us") / F.lit(DAY_US)).cast("long").alias("flr"),
    ).collect()
    for r in rows:
        assert r["trunc"] == r["flr"] + 1


def test_dow_formula_on_negative_days(spark):
    """q_seasonality_profile's ISO day-of-week from the epoch day
    (day 0 = Thursday = 4): Spark's % is C-style like DuckDB's, so
    with a FLOORED day both engines produce the same dow — including
    the (consistent) <=0 values on pre-1970 days."""
    days = [-8, -3, -1, 0, 1, 3, 6, 7]
    df = spark.createDataFrame([(d,) for d in days], "day long")
    got = {
        r["day"]: r["dow"]
        for r in df.select(
            "day", ((F.col("day") + 3) % 7 + 1).alias("dow")
        ).collect()
    }
    for d in days:
        c_mod = (d + 3) - int((d + 3) / 7) * 7  # C-style %, both engines
        assert got[d] == c_mod + 1, d
