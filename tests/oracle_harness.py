"""Local mini-driver: compare each declared query against its DuckDB
oracle the way the real driver does (row count + columns + values,
order-insensitive).

Comparison is EXACT (no epsilon): the queries are engineered so both
engines produce identical values (decimal-exact sums, integer
microsecond times, rounded similarities). If exact compare passes
here, any reasonable value-hash the driver computes will match.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""


# The driver's order-insensitive value hash is TYPE-SENSITIVE at
# serialization: DuckDB widening BIGINT SUM() to HUGEINT (int128) made
# numerically equal values hash differently (the r6/r7 token-budget
# pair — two rounds of misdiagnosis because _normalize_cell collapses
# int128→int locally and can never witness the divergence). Every
# oracle output column must therefore stay inside this driver-safe
# set; anything else (HUGEINT, DECIMAL, FLOAT, TINYINT…) must be CAST
# in the oracle SQL itself.
ALLOWED_ORACLE_TYPES = {
    "BIGINT",
    "INTEGER",
    "DOUBLE",
    "VARCHAR",
    "DATE",
    "BOOLEAN",
    "TIMESTAMP",
}


def oracle_type_violations(
    con: duckdb.DuckDBPyConnection, sql: str
) -> list[tuple[str, str]]:
    """(column, duckdb_type) pairs outside ALLOWED_ORACLE_TYPES.

    Uses ``con.sql`` (bind/plan only, no execution) so the full
    246-oracle sweep stays cheap enough for a unit test.
    """
    rel = con.sql(sql)
    return [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t) not in ALLOWED_ORACLE_TYPES
    ]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize_cell(v):
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float):
        # collapse -0.0 / 0.0; NaNs compare equal to themselves
        if v == 0.0:
            return 0.0
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_normalize_cell(x) for x in v)
    return v


def _normalize_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [
        tuple(_normalize_cell(row[i]) for i in order)
        for row in rows
    ]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return out


def compare_query(spark, sf_dir: str, name: str, fn, sql: str | None) -> CompareResult:
    sdf = fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]
    if sql is None:
        ok = len(s_rows) >= 0  # rows-only check: it ran with stable schema
        return CompareResult(name, ok, f"rows-only: {len(s_rows)} rows")
    con = duck_connection(sf_dir)
    try:
        bad_types = oracle_type_violations(con, sql)
        if bad_types:
            return CompareResult(
                name,
                False,
                f"oracle output types outside driver-safe set: {bad_types}"
                " (CAST in the oracle SQL)",
            )
        res = con.execute(sql)
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
    finally:
        con.close()
    if sorted(s_cols) != sorted(d_cols):
        return CompareResult(
            name, False, f"columns differ: spark={s_cols} duck={d_cols}"
        )
    if len(s_rows) != len(d_rows):
        return CompareResult(
            name, False, f"row count: spark={len(s_rows)} duck={len(d_rows)}"
        )
    sn = _normalize_rows(s_cols, s_rows)
    dn = _normalize_rows(d_cols, d_rows)
    if sn != dn:
        diffs = [
            (a, b) for a, b in zip(sn, dn) if a != b
        ][:3]
        return CompareResult(name, False, f"values differ; first diffs: {diffs}")
    return CompareResult(name, True, f"{len(s_rows)} rows exact-match")
