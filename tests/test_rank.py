"""operators/rank.py: the two-pass distributed ranking must be
byte-identical to the single-partition global window it replaces
(r4 VERDICT 'What's wrong #2' — the exact-oracle-preserving rewrite
of the statistics family's scale anti-pattern)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from babylon_data_loader_spark.operators.rank import (
    running_totals,
    value_ranks,
    with_global_ntile,
    with_global_row_number,
)


def _frame(spark, n=997, seed=7):
    rng = random.Random(seed)
    rows = [(i, rng.randint(0, 50), rng.randint(0, 10**6)) for i in range(n)]
    # skewed duplicates so tie groups straddle range boundaries
    rows += [(n + i, 25, 1234) for i in range(200)]
    return spark.createDataFrame(rows, "id BIGINT, v BIGINT, w BIGINT").repartition(16)


def test_global_row_number_matches_window(spark):
    df = _frame(spark)
    got = with_global_row_number(
        df, [F.col("v").asc(), F.col("id").asc()], "rn"
    )
    want = df.withColumn(
        "rn", F.row_number().over(Window.orderBy("v", "id"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_running_totals_match_window(spark):
    df = _frame(spark)
    got = running_totals(
        df,
        [F.col("v").asc(), F.col("id").asc()],
        {"run_w": F.col("w"), "run_n": F.lit(1)},
    )
    w = Window.orderBy("v", "id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = df.withColumn("run_w", F.sum("w").over(w)).withColumn(
        "run_n", F.sum(F.lit(1)).over(w)
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_value_ranks_tie_averaged(spark):
    df = _frame(spark)
    got = value_ranks(df, ["v"])
    want = (
        df.groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rnk", F.rank().over(Window.orderBy("v")))
    )
    # rank over distinct values must equal rank over rows, and the
    # doubled tie-average identity 2*RANK + cnt - 1 must hold
    rows = df.select(
        "v",
        F.rank().over(Window.orderBy("v")).alias("row_rnk"),
        F.count(F.lit(1)).over(Window.partitionBy("v")).alias("ties"),
    ).distinct()
    j = got.join(rows, "v")
    bad = j.filter(
        (F.col("rnk") != F.col("row_rnk"))
        | (F.col("cnt") != F.col("ties"))
        | (F.col("rnk2_avg") != 2 * F.col("row_rnk") + F.col("ties") - 1)
    )
    assert got.count() == want.count()
    assert bad.count() == 0


def test_value_ranks_descending(spark):
    df = _frame(spark, n=300)
    got = value_ranks(df, ["v"], descending=True)
    rows = df.select(
        "v",
        F.rank().over(Window.orderBy(F.col("v").desc())).alias("r"),
    ).distinct()
    assert got.join(rows, "v").filter(
        F.col("rnk") != F.col("r")
    ).count() == 0


def test_global_ntile_matches_window(spark):
    df = _frame(spark, n=503)
    for n in (4, 10, 7):
        got = with_global_ntile(
            df, [F.col("v").asc(), F.col("id").asc()], n, "tile"
        )
        want = df.withColumn(
            "tile", F.ntile(n).over(Window.orderBy("v", "id"))
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), f"ntile({n})"


def test_global_ntile_more_tiles_than_rows(spark):
    df = spark.createDataFrame(
        [(1, 10, 0), (2, 20, 0), (3, 30, 0)], "id BIGINT, v BIGINT, w BIGINT"
    )
    got = with_global_ntile(df, [F.col("v").asc()], 10, "tile")
    want = df.withColumn("tile", F.ntile(10).over(Window.orderBy("v")))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_empty_input(spark):
    df = spark.createDataFrame([], "id BIGINT, v BIGINT, w BIGINT")
    assert (
        with_global_row_number(df, [F.col("v").asc()], "rn").count() == 0
    )
    assert value_ranks(df, ["v"]).count() == 0


@pytest.mark.parametrize(
    "shape",
    ["all_equal", "sorted", "reversed", "single", "two_values"],
)
def test_adversarial_shapes_match_window(spark, shape):
    """Degenerate orderings: one giant tie group, pre-sorted input,
    reverse-sorted input, a single row, and a two-value column — the
    range partitioner's worst cases (empty partitions, every tie
    straddling boundaries)."""
    n = 400
    rows = {
        "all_equal": [(i, 7, i) for i in range(n)],
        "sorted": [(i, i, i) for i in range(n)],
        "reversed": [(i, n - i, i) for i in range(n)],
        "single": [(0, 42, 0)],
        "two_values": [(i, i % 2, i) for i in range(n)],
    }[shape]
    df = spark.createDataFrame(
        rows, "id BIGINT, v BIGINT, w BIGINT"
    ).repartition(16)

    got_rn = with_global_row_number(
        df, [F.col("v").asc(), F.col("id").asc()], "rn"
    )
    want_rn = df.withColumn(
        "rn", F.row_number().over(Window.orderBy("v", "id"))
    )
    assert sorted(map(tuple, got_rn.collect())) == sorted(
        map(tuple, want_rn.collect())
    )

    got_vr = value_ranks(df, ["v"])
    want_vr = (
        df.select(
            "v",
            F.rank().over(Window.orderBy("v")).alias("rnk"),
            F.count(F.lit(1)).over(Window.partitionBy("v")).alias("cnt"),
        )
        .distinct()
    )
    assert sorted(
        (r["v"], r["rnk"], r["cnt"]) for r in got_vr.collect()
    ) == sorted(map(tuple, want_vr.collect()))

    got_nt = with_global_ntile(
        df, [F.col("v").asc(), F.col("id").asc()], 7, "t"
    )
    want_nt = df.withColumn(
        "t", F.ntile(7).over(Window.orderBy("v", "id"))
    )
    assert sorted(map(tuple, got_nt.collect())) == sorted(
        map(tuple, want_nt.collect())
    )


def test_grouped_running_totals_match_grouped_window(spark):
    """The grouped prefix scan must equal Window.partitionBy(group)
    .orderBy(...) exactly — including groups that straddle range
    partition boundaries (few groups, many partitions guarantees
    straddling)."""
    from babylon_data_loader_spark.operators.rank import (
        grouped_running_totals,
    )

    rng = random.Random(11)
    rows = [
        (i, ["a", "b", "c"][rng.randint(0, 2)], rng.randint(0, 30), rng.randint(1, 9))
        for i in range(2000)
    ]
    df = spark.createDataFrame(
        rows, "id BIGINT, g STRING, v BIGINT, w BIGINT"
    ).repartition(16)

    got = grouped_running_totals(
        df,
        ["g"],
        [F.col("v").asc(), F.col("id").asc()],
        {"run_w": F.col("w"), "run_n": F.lit(1)},
    )
    w = (
        Window.partitionBy("g")
        .orderBy("v", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = df.withColumn("run_w", F.sum("w").over(w)).withColumn(
        "run_n", F.sum(F.lit(1)).over(w)
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_grouped_running_totals_single_group_and_empty(spark):
    from babylon_data_loader_spark.operators.rank import (
        grouped_running_totals,
    )

    one = spark.createDataFrame(
        [(i, "only", i % 5, 1) for i in range(300)],
        "id BIGINT, g STRING, v BIGINT, w BIGINT",
    ).repartition(8)
    got = grouped_running_totals(
        one, ["g"], [F.col("v").asc(), F.col("id").asc()], {"r": F.col("w")}
    )
    w = (
        Window.partitionBy("g")
        .orderBy("v", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = one.withColumn("r", F.sum("w").over(w))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )

    empty = spark.createDataFrame([], "id BIGINT, g STRING, v BIGINT, w BIGINT")
    assert (
        grouped_running_totals(
            empty, ["g"], [F.col("v").asc()], {"r": F.col("w")}
        ).count()
        == 0
    )


def test_grouped_running_totals_null_group(spark):
    """A NULL group value is a real group — the offsets join must be
    null-safe or its rows silently vanish."""
    from babylon_data_loader_spark.operators.rank import (
        grouped_running_totals,
    )

    rows = [(i, None if i % 3 == 0 else "g", i % 7, 1) for i in range(120)]
    df = spark.createDataFrame(
        rows, "id BIGINT, g STRING, v BIGINT, w BIGINT"
    ).repartition(8)
    got = grouped_running_totals(
        df, ["g"], [F.col("v").asc(), F.col("id").asc()], {"r": F.col("w")}
    )
    assert got.count() == 120  # nothing dropped
    w = (
        Window.partitionBy("g")
        .orderBy("v", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = df.withColumn("r", F.sum("w").over(w))
    assert sorted(
        map(tuple, got.collect()), key=str
    ) == sorted(map(tuple, want.collect()), key=str)


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_randomized_with_nulls_and_decimals_match_window(spark, seed):
    """Seeded-random fuzz: NULLs in the SORT column (ranked values —
    sorted first under asc, like the window form), negative values,
    heavy duplication, and a DECIMAL sum column. The two-pass scan
    must agree with the single-partition window on every row."""
    from decimal import Decimal

    rng = random.Random(seed)
    rows = []
    for i in range(rng.randint(300, 900)):
        v = rng.choice([None, *range(-5, 6)])
        amt = Decimal(rng.randint(-10_000, 10_000)) / 100
        rows.append((i, v, amt))
    df = spark.createDataFrame(
        rows, "id BIGINT, v BIGINT, amt DECIMAL(12,2)"
    ).repartition(16)
    order = [F.col("v").asc(), F.col("id").asc()]

    got = running_totals(df, order, {"cum_amt": F.col("amt")})
    want = df.withColumn(
        "cum_amt",
        F.sum("amt").over(
            Window.orderBy("v", "id").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )

    got_rn = with_global_row_number(df, order, "rn")
    want_rn = df.withColumn(
        "rn", F.row_number().over(Window.orderBy("v", "id"))
    )
    assert sorted(map(tuple, got_rn.collect())) == sorted(
        map(tuple, want_rn.collect())
    )

    # value_ranks treats NULL as a ranked value (sorted first);
    # rnk/cnt must match the window's RANK + per-value COUNT
    got_vr = {
        (r["v"], r["rnk"], r["cnt"], r["rnk2_avg"])
        for r in value_ranks(df, ["v"]).collect()
    }
    want_vr = {
        (r["v"], r["rnk"], r["cnt"], 2 * r["rnk"] + r["cnt"] - 1)
        for r in df.select(
            "v",
            F.rank().over(Window.orderBy("v")).alias("rnk"),
            F.count(F.lit(1))
            .over(Window.partitionBy("v"))
            .alias("cnt"),
        )
        .distinct()
        .collect()
    }
    assert got_vr == want_vr


@pytest.mark.parametrize("seed", [5, 31])
def test_null_summed_column_matches_window(spark, seed):
    """r5 ADVICE medium: NULLs in the SUMMED column (not just the sort
    column). SQL's running SUM is NULL only before the first non-null
    value in the global prefix; a range partition whose local prefix
    is all-NULL must inherit earlier partitions' sum. Fuzz with long
    all-NULL runs at the head so whole partitions are NULL-only."""
    rng = random.Random(seed)
    rows = []
    for i in range(700):
        # first 250 rows (by sort order) all-NULL: several leading
        # range partitions see no non-null value at all
        amt = None if i < 250 else rng.choice([None, *range(-50, 51)])
        rows.append((i, amt))
    df = spark.createDataFrame(
        rows, "id BIGINT, amt BIGINT"
    ).repartition(16)
    order = [F.col("id").asc()]

    got = running_totals(df, order, {"cum_amt": F.col("amt")})
    want = df.withColumn(
        "cum_amt",
        F.sum("amt").over(
            Window.orderBy("id").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    assert sorted(map(tuple, got.collect()), key=str) == sorted(
        map(tuple, want.collect()), key=str
    )


def test_null_summed_column_grouped_matches_window(spark):
    """Grouped twin of the NULL-summed-column contract: per-group
    running SUM with groups whose leading rows are all-NULL."""
    from babylon_data_loader_spark.operators.rank import (
        grouped_running_totals,
    )

    rng = random.Random(13)
    rows = []
    for i in range(600):
        g = i % 3
        amt = None if (i // 3) < 60 else rng.choice([None, i, -i])
        rows.append((i, g, amt))
    df = spark.createDataFrame(
        rows, "id BIGINT, g INT, amt BIGINT"
    ).repartition(16)

    got = grouped_running_totals(
        df, ["g"], [F.col("id").asc()], {"cum_amt": F.col("amt")}
    )
    want = df.withColumn(
        "cum_amt",
        F.sum("amt").over(
            Window.partitionBy("g")
            .orderBy("id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    assert sorted(map(tuple, got.collect()), key=str) == sorted(
        map(tuple, want.collect()), key=str
    )


def test_column_collision_raises(spark):
    """r5 ADVICE low: output/internal names colliding with caller
    columns must fail loudly, never silently replace data."""
    from babylon_data_loader_spark.operators.rank import (
        grouped_running_totals,
    )

    df = spark.createDataFrame(
        [(1, 2, 3)], "id BIGINT, rn BIGINT, __rank_pid BIGINT"
    )
    order = [F.col("id").asc()]
    with pytest.raises(ValueError, match="collid|exist"):
        with_global_row_number(df.select("id", "rn"), order, "rn")
    with pytest.raises(ValueError, match="collid|exist"):
        running_totals(df.select("id", "__rank_pid"), order, {"s": F.col("id")})
    with pytest.raises(ValueError, match="collid|exist"):
        grouped_running_totals(
            df.select("id", "rn"), ["rn"], order, {"rn": F.col("id")}
        )
    with pytest.raises(ValueError, match="collid|exist"):
        with_global_ntile(df.select("id", "rn"), order, 4, name="rn")
    with pytest.raises(ValueError, match="collide"):
        value_ranks(df.selectExpr("id AS cnt"), ["cnt"])


@pytest.mark.parametrize("seed", [3, 17])
def test_running_max_min_match_window(spark, seed):
    """Distributed prefix MAX/MIN vs the global window, with NULLs in
    the tracked column (window MAX ignores NULLs: NULL only before
    the first non-null globally) and long all-NULL head runs."""
    from babylon_data_loader_spark.operators.rank import (
        running_max,
        running_min,
    )

    rng = random.Random(seed)
    rows = []
    for i in range(600):
        v = None if i < 150 else rng.choice([None, *range(-40, 41)])
        rows.append((i, v))
    df = spark.createDataFrame(
        rows, "id BIGINT, v BIGINT"
    ).repartition(16)
    order = [F.col("id").asc()]
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)

    got = running_max(df, order, {"mx": F.col("v")})
    want = df.withColumn("mx", F.max("v").over(w))
    assert sorted(map(tuple, got.collect()), key=str) == sorted(
        map(tuple, want.collect()), key=str
    )

    got = running_min(df, order, {"mn": F.col("v")})
    want = df.withColumn("mn", F.min("v").over(w))
    assert sorted(map(tuple, got.collect()), key=str) == sorted(
        map(tuple, want.collect()), key=str
    )

    with pytest.raises(ValueError, match="exist"):
        running_max(df, order, {"v": F.col("v")})


def test_totals_sidecar_sweeps_retired_versions(spark, tmp_path):
    """Publishing a versioned totals sidecar removes sibling
    `_totals_*` dirs of RETIRED versions from the cache dir (r15
    ADVICE: the v1->v2 bump stranded old sidecars forever in
    still-live ranged stores on stable datasets), while leaving
    current-version sidecars of other keys alone."""
    import os

    from babylon_data_loader_spark.operators.rank import (
        _TOTALS_SIDECAR_V,
        _cached_totals_rows,
    )

    cache = tmp_path / "store"
    cache.mkdir()
    # a stranded pre-versioning sidecar and a current-version sibling
    (cache / "_totals_oldkey").mkdir()
    keep = cache / f"_totals_{_TOTALS_SIDECAR_V}_otherkey"
    keep.mkdir()
    totals = spark.createDataFrame([(0, 5)], "_pid int, s long")
    rows = _cached_totals_rows(totals, str(cache), "k1")
    assert [(r["_pid"], r["s"]) for r in rows] == [(0, 5)]
    assert not (cache / "_totals_oldkey").exists()
    assert keep.exists()
    assert os.path.exists(
        cache / f"_totals_{_TOTALS_SIDECAR_V}_k1" / "_SUCCESS"
    )
