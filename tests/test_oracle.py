"""Every declared query must exact-match its DuckDB oracle at sf0.001
(fast); run manually at sf0.01 via scripts/check_oracle.py — the scale
the real driver uses."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


def _cases():
    qmap = entrymod.queries()
    omap = entrymod.oracle_sql()
    return [(name, fn, omap.get(name)) for name, fn in sorted(qmap.items())]


@pytest.mark.parametrize("name,fn,sql", _cases(), ids=[c[0] for c in _cases()])
def test_query_matches_oracle(spark, sf_dir, name, fn, sql):
    from tests.oracle_harness import compare_query

    result = compare_query(spark, sf_dir, name, fn, sql)
    assert result.ok, f"{name}: {result.detail}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "event_type",
        "n",
        "total_value",
        "first_us",
        "last_us",
    }


# ---------------------------------------------------------------------------
# Negative controls for the comparator itself (r12 VERDICT ask #3):
# every certification number in this repo flows through compare_query,
# so a comparator bug that silently passes everything is the one
# failure mode a fully-green sweep cannot detect. Plant deliberately
# WRONG Spark results and assert each detection channel fires.
# ---------------------------------------------------------------------------


def _const_fn(rows, schema):
    def fn(spark, sf_dir):
        return spark.createDataFrame(rows, schema)

    return fn


_ORACLE_3ROWS = (
    "SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'a'),"
    " (CAST(2 AS BIGINT), 'b'), (CAST(3 AS BIGINT), 'c'))"
    " AS t(id, tag)"
)


def test_comparator_passes_the_planted_truth(spark, sf_dir):
    from tests.oracle_harness import compare_query

    good = _const_fn(
        [(1, "a"), (2, "b"), (3, "c")], "id BIGINT, tag STRING"
    )
    assert compare_query(spark, sf_dir, "ctrl_ok", good, _ORACLE_3ROWS).ok


def test_comparator_fails_off_by_one_row(spark, sf_dir):
    from tests.oracle_harness import compare_query

    short = _const_fn([(1, "a"), (2, "b")], "id BIGINT, tag STRING")
    res = compare_query(spark, sf_dir, "ctrl_rows", short, _ORACLE_3ROWS)
    assert not res.ok and "row count" in res.detail


def test_comparator_fails_renamed_column(spark, sf_dir):
    from tests.oracle_harness import compare_query

    renamed = _const_fn(
        [(1, "a"), (2, "b"), (3, "c")], "id BIGINT, label STRING"
    )
    res = compare_query(spark, sf_dir, "ctrl_cols", renamed, _ORACLE_3ROWS)
    assert not res.ok and "columns differ" in res.detail


def test_comparator_fails_perturbed_value(spark, sf_dir):
    from tests.oracle_harness import compare_query

    off = _const_fn(
        [(1, "a"), (2, "b"), (3, "X")], "id BIGINT, tag STRING"
    )
    res = compare_query(spark, sf_dir, "ctrl_vals", off, _ORACLE_3ROWS)
    assert not res.ok and "values differ" in res.detail


def test_comparator_fails_unsafe_oracle_output_type(spark, sf_dir):
    """Uncast SUM(BIGINT) widens to HUGEINT in DuckDB — outside the
    driver-safe serialization set; the type gate must reject it even
    when the values would match."""
    from tests.oracle_harness import compare_query

    fn = _const_fn([(6,)], "s BIGINT")
    res = compare_query(
        spark,
        sf_dir,
        "ctrl_types",
        fn,
        "SELECT SUM(x) AS s FROM (VALUES (1), (2), (3)) AS t(x)",
    )
    assert not res.ok and "types" in res.detail
