"""Oracle output-type gate (r7 VERDICT ask #2).

The driver's value hash is type-sensitive at serialization: a DuckDB
oracle whose output column widens to HUGEINT (int128) hash-mismatches
a numerically identical Spark BIGINT column — the exact failure that
cost the token-budget pair two rounds (r6+r7). The local exact-compare
harness can never witness this (it normalizes through Python ints), so
this gate asserts it at the TYPE level instead: every oracle result
column must plan to a driver-safe DuckDB type.

Bind-only (``con.sql``): no query executes, so the full registry sweep
is fast enough to run on every pytest invocation.
"""

from __future__ import annotations

import duckdb
import pytest

import babylon_data_loader_spark.queries as q
from tests.oracle_harness import (
    ALLOWED_ORACLE_TYPES,
    TABLES,
    oracle_type_violations,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield c
    c.close()


def test_seeded_hugeint_fixture_fails_gate(con):
    """An uncast SUM(BIGINT) widens to HUGEINT and must be flagged —
    the exact shape that broke q_token_budget_sample at the driver."""
    bad_sql = "SELECT source, SUM(doc_id) AS s FROM documents GROUP BY source"
    violations = oracle_type_violations(con, bad_sql)
    assert violations == [("s", "HUGEINT")]
    # and the one-line CAST fix clears it
    fixed = (
        "SELECT source, CAST(SUM(doc_id) AS BIGINT) AS s "
        "FROM documents GROUP BY source"
    )
    assert oracle_type_violations(con, fixed) == []


def test_seeded_decimal_fixture_fails_gate(con):
    violations = oracle_type_violations(
        con, "SELECT CAST(1.5 AS DECIMAL(10,2)) AS d"
    )
    assert violations == [("d", "DECIMAL(10,2)")]


def test_every_registered_oracle_is_driver_type_safe(con):
    q.load_all()
    assert len(q.ORACLES) >= 246
    bad = {}
    for name, sql in sorted(q.ORACLES.items()):
        violations = oracle_type_violations(con, sql)
        if violations:
            bad[name] = violations
    assert not bad, (
        "oracle output columns outside the driver-safe type set "
        f"{sorted(ALLOWED_ORACLE_TYPES)}: {bad} — add a CAST in the "
        "oracle SQL (see tests/oracle_harness.py docs)"
    )


def test_priority_window_is_well_formed():
    """The driver verifies exactly the first 50 PRIORITY entries; the
    list must cover a full window, name only registered queries, and
    contain no duplicates (r7 VERDICT ask #6). Since r9 every WINDOW
    slot must also be oracle-backed (r8 VERDICT ask #1): a rows-only
    query in the window can only ever produce a `no_oracle` driver
    row, wasting the round's one hard external signal — rows-only
    queries belong below slot 50 (their invariants raise in-query and
    pytest runs them)."""
    q.load_all()
    assert len(q.PRIORITY) >= 50
    assert len(set(q.PRIORITY)) == len(q.PRIORITY), "duplicate PRIORITY entry"
    unknown = [n for n in q.PRIORITY if n not in q.QUERIES]
    assert not unknown, f"PRIORITY names not in registry: {unknown}"
    window = list(q.QUERIES)[:50]
    assert window == q.PRIORITY[:50]
    # One-round exception (r13 VERDICT ask #1): q_tokwin_maintenance
    # is the only declared key with ZERO driver entries across
    # CORRECTNESS_r01-r13; the judge asked it be windowed once even
    # though its row is rows-only. Remove it from this allowlist when
    # the r15 window rotates it back out.
    windowed_rows_only_allowed = {"q_tokwin_maintenance"}
    rows_only = [
        n
        for n in window
        if n not in q.ORACLES and n not in windowed_rows_only_allowed
    ]
    assert not rows_only, (
        f"rows-only queries inside the 50-slot driver window: "
        f"{rows_only}"
    )
