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
